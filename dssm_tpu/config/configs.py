"""Frozen dataclass configs and the five named presets.

Reference parity: the canonical DSSM-family code configures itself with
~6 `tf.app.flags` flags plus hardcoded constants (TRIGRAM_D, NEG=50,
BS=1000, gamma=20 — SURVEY.md §6.6 [R-high]). Every such constant is
promoted to a config field here; the five presets mirror BASELINE.json:7-11.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


class _Replaceable:
    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TowerConfig(_Replaceable):
    """Architecture of one (or both, if shared) semantic towers.

    Reference: 30k->300->300->128 tanh MLP per the DSSM paper / BASELINE.json:7;
    the canonical code lineage uses relu and shared query/doc weights
    (SURVEY.md §3.1 row 3) — both are config flags here.
    """

    arch: str = "mlp"  # "mlp" | "cnn" | "lstm"
    vocab_size: int = 30_000  # letter-trigram hash dimension (TRIGRAM_D)
    embed_width: int = 300  # output width of the sparse first layer
    hidden_dims: Tuple[int, ...] = (300,)  # dense layers between embed and semantic
    semantic_dim: int = 128  # final embedding dimension
    activation: str = "tanh"  # "tanh" | "relu"
    shared_weights: bool = True  # share tower weights between query and doc
    # CNN (CLSM) only: conv window over word sequence, feature maps
    conv_window: int = 3
    conv_channels: int = 300
    # LSTM only: hidden size of the recurrent cell
    lstm_hidden: int = 300
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # "bfloat16" on TPU for MXU throughput
    # Storage dtype of the sparse first-layer table ONLY ("" = param_dtype).
    # "bfloat16" halves table HBM footprint and doubles gather/scatter DMA
    # bandwidth; updates then use stochastic rounding (train.
    # table_stochastic_round) so sub-ulp gradient steps survive in
    # expectation instead of all rounding to zero. "int8" quarters it:
    # rows quantize against a per-row f32 scale (the `<table>_scale` param,
    # fixed at init with table_int8_headroom growth margin); lookups
    # dequantize after the group gather, updates accumulate in f32 and
    # stochastically round back to the int8 grid.
    table_dtype: str = ""
    # int8 only: scale = init_row_absmax * headroom / 127 — the margin the
    # row may GROW during training before clipping at the grid edge.
    table_int8_headroom: float = 8.0

    @property
    def table_dtype_resolved(self) -> str:
        return self.table_dtype or self.param_dtype

    @property
    def is_sequence_model(self) -> bool:
        return self.arch in ("cnn", "lstm")


@dataclass(frozen=True)
class DataConfig(_Replaceable):
    """Input representation.

    TPU has no sparse tensors: a text is a fixed-length (indices[K], weights[K])
    pair, padded with index 0 / weight 0 (index 0 is reserved for padding by
    the trigram hasher). Sequence models use (indices[T, Kw], weights[T, Kw])
    plus a word mask[T].
    """

    max_trigrams: int = 64  # K: nonzeros kept per text (bag-of-trigrams models)
    # K for the QUERY side only (0 = same as max_trigrams). Queries are much
    # shorter than titles (toy corpus p100: 32 vs 62), and the on-device
    # count build is O(B x K x U2) VPU work per side — the single largest
    # compute stage — so a tighter query K is a direct win.
    max_trigrams_query: int = 0
    max_words: int = 16  # T: words kept per text (cnn/lstm)
    max_trigrams_per_word: int = 8  # Kw
    normalize_counts: bool = False  # l2-normalize trigram count vector
    # Per-batch index dedupe (kernels/dedup_embed.py): lookups become a
    # U-row compact gather + count-matrix matmul. The TPU fast path.
    dedup_lookup: bool = True
    # U: compact rows per batch (static). Rows are gathered in sublane GROUPS
    # (8 for f32 tables), so budget ~8x the expected distinct-trigram count.
    max_unique: int = 8192
    # U2: exact unique-row slots (count-matrix width, two-level dedupe).
    # Budget ~= the expected distinct-trigram count per batch.
    max_unique_rows: int = 1024
    # Third dedupe level (loader.reslot_local, 0 = off): re-slot each DATA
    # SHARD's lookups into its own slot space of this width. At multi-host
    # scale max_unique_rows must cover the GLOBAL batch's unique rows (e.g.
    # 8192 at 65,536 rows) but each shard touches only a fraction — the
    # on-device count build is O(B_local x K x width) and the row-select is
    # O(width x max_unique x H), both direct wins. Budget ~= the distinct
    # -trigram count of ONE shard's rows.
    max_unique_rows_local: int = 0
    toy_vocab_words: int = 512  # toy dataset: word vocabulary size
    toy_num_pairs: int = 4096  # toy dataset: number of query-title pairs
    # File-backed corpus (data/corpus.py): .tsv/.txt ("query\ttitle" lines)
    # or .jsonl ({"query":..., "title":...}). Empty = the toy generator.
    path: str = ""
    eval_frac: float = 0.1  # held-out fraction for the eval split
    max_pairs: int = 0  # truncate the file corpus (0 = use all pairs)
    # Frequency-ordered vocab remap (data/remap.py): permute table rows so
    # Zipf-hot trigrams pack into dense row-group prefixes — collapses the
    # per-batch unique GROUP count the DMA gather/scatter kernels pay for.
    # Pure row permutation; training math is unchanged.
    freq_remap: bool = False
    # Host input-pipeline thread-pool width (loader.batch_iterator): W
    # upcoming batches build concurrently with ordered, bit-identical
    # reassembly. At multi-host scale the per-step GLOBAL-batch dedupe is the
    # dominant host cost; size W ~= ceil(host_ms_per_batch / device
    # step ms) on the production host (0/1 = serial build).
    pipeline_workers: int = 0
    # Epoch shuffling. True (default): a fresh permutation per epoch.
    # False: every epoch replays the SAME (seed, 0) permutation — the
    # reference-faithful order (its pre-shuffled pickle packs are iterated
    # in a fixed order every epoch, SURVEY.md §4.1 [R-high]) and the
    # precondition for cache_epoch_batches.
    reshuffle_each_epoch: bool = True
    # Cache the host pipeline's finished batches (dedupe + reslot +
    # compress) during the first epoch and replay them afterwards: the
    # per-epoch batch stream is identical when reshuffle_each_epoch=False,
    # so steady-state host cost drops to ~a dict lookup per step. Costs
    # host RAM ~= the compressed corpus + dedup fields (~100 MB at the
    # full preset, ~70 MB at the multihost preset). VERDICT r5 item 4.
    cache_epoch_batches: bool = False
    seed: int = 0


@dataclass(frozen=True)
class LossConfig(_Replaceable):
    """Cosine-softmax loss over negatives.

    mode="in_batch": score the full [B, B'] similarity matrix; diagonal (offset
      by the shard's global row offset) are positives — B'-1 negatives per query.
      This is the build's primary mode (BASELINE.json:8) and a strict superset
      of the reference's rotation trick.
    mode="rotate": the reference-family FD_rotate trick — each query is scored
      against its own doc plus `num_negatives` rotated copies of the doc batch
      (SURVEY.md §3.1 row 4 [R-high], canonical NEG=50). Kept for step-for-step
      parity with the numpy oracle.
    """

    mode: str = "in_batch"  # "in_batch" | "rotate"
    num_negatives: int = 50  # NEG, rotate mode only
    gamma: float = 20.0  # softmax smoothing γ (hardcoded 20 in the reference)


@dataclass(frozen=True)
class MeshConfig(_Replaceable):
    """Device mesh: ('data', 'model').

    data  — batch sharding (DP) + the axis the doc-embedding all-gather rides
    model — vocab-axis sharding of the trigram embedding table (TP), used when
            vocab_size x embed_width exceeds the per-chip HBM budget
            (BASELINE.json:11). 1 disables embedding sharding.
    """

    data_parallel: int = -1  # -1: all remaining devices
    model_parallel: int = 1
    global_negatives: bool = True  # all-gather doc embeddings over 'data'
    # Wire dtype for the two big table-path collectives: the mp compact-
    # gather psum and the data-axis compact-grad psum (via the rows2 cast,
    # parallel/sparse_step.py). "bfloat16" halves both payloads; the lookup
    # consumes the compact at compute_dtype (bf16 at the big presets)
    # anyway, and table updates are SGD row adds, so the rounding enters
    # only through already-bf16 compute. "float32" (default) keeps the
    # bit-exact-vs-single-device parity the tests assert.
    collective_dtype: str = "float32"  # "float32" | "bfloat16"


@dataclass(frozen=True)
class TrainConfig(_Replaceable):
    batch_size: int = 256  # global batch (split across 'data' axis)
    learning_rate: float = 0.1
    optimizer: str = "sgd"  # "sgd" | "momentum" | "adam"
    momentum: float = 0.9
    max_steps: int = 1000
    eval_every: int = 100  # reference: epoch_steps
    log_every: int = 20
    checkpoint_every: int = 500
    keep_checkpoints: int = 3
    seed: int = 42
    use_pallas: bool = True  # Pallas kernels when on TPU; XLA fallback otherwise
    remat: bool = False  # jax.checkpoint the towers (trade FLOPs for HBM)
    # Row-wise sparse table updates (reference parity: TF IndexedSlices).
    # Exact for SGD; momentum/adam use the dense step regardless.
    sparse_embed_update: bool = True
    # Table-specific optimizer for the sparse path: "sgd" (reference parity)
    # or "adagrad" (row-wise AdaGrad, the production embedding-table standard;
    # the per-row accumulator is stored in the table's spare lane-padding
    # column so optimizer state rides the same DMA gather/scatter).
    table_optimizer: str = "sgd"
    table_adagrad_eps: float = 1e-6
    # Stochastic rounding for sub-f32 table updates (tower.table_dtype=
    # "bfloat16"): accumulate old_row + update in f32, round to bf16 toward
    # each neighbor with probability proportional to proximity (Pallas
    # pltpu.stochastic_round on TPU, bit-trick fallback on CPU). Unbiased:
    # E[table] follows the f32 trajectory even when single updates are below
    # half a bf16 ulp (which plain round-to-nearest would erase entirely).
    table_stochastic_round: bool = True
    # Steps fused into one device dispatch via lax.scan over K stacked
    # batches. Amortizes per-dispatch host overhead (dominant on relayed
    # runtimes; ~0.8 ms/step on the axon tunnel vs ~50 µs locally). 1 = off.
    steps_per_call: int = 1
    # Max async dispatches in flight before the loop blocks on the oldest.
    # Bounds device-side queue memory, and on the CPU backend prevents
    # collective-rendezvous starvation: an unbounded queue of N-partition
    # programs on a small Eigen pool can leave a partition thread unscheduled
    # past the 40 s rendezvous abort (observed at 8 partitions on 2 cores).
    max_inflight_steps: int = 4


@dataclass(frozen=True)
class IOConfig(_Replaceable):
    workdir: str = "/tmp/dssm_run"
    metrics_file: str = "metrics.jsonl"
    profile_dir: Optional[str] = None
    tensorboard: bool = False
    # Bins for per-weight histograms in the periodic weight summaries
    # (reference: tf.summary.histogram in variable_summaries). 0 = stats only.
    weight_histogram_bins: int = 0
    # Numeric sanitizer: jax_debug_nans re-runs any op that produced a
    # NaN/Inf un-jitted and raises FloatingPointError at the exact op
    # (SURVEY §6.2). Debug-only — disables async dispatch, so steps
    # serialize; never leave on in production runs.
    debug_nans: bool = False


@dataclass(frozen=True)
class RunConfig(_Replaceable):
    name: str = "tiny"
    tower: TowerConfig = field(default_factory=TowerConfig)
    data: DataConfig = field(default_factory=DataConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    io: IOConfig = field(default_factory=IOConfig)


def _preset_tiny() -> RunConfig:
    """Tiny DSSM: 30k hash, 300-300-128 towers, batch 256, CPU-runnable.

    BASELINE.json:7.
    """
    return RunConfig(
        name="tiny",
        tower=TowerConfig(arch="mlp", vocab_size=30_000, embed_width=300,
                          hidden_dims=(300,), semantic_dim=128),
        train=TrainConfig(batch_size=256, use_pallas=False),
    )


def _preset_full() -> RunConfig:
    """Full DSSM: 500k trigram vocab, batch 1024 in-batch negatives.

    BASELINE.json:8.
    """
    return RunConfig(
        name="full",
        tower=TowerConfig(arch="mlp", vocab_size=500_000, embed_width=300,
                          hidden_dims=(300,), semantic_dim=128,
                          compute_dtype="bfloat16"),
        # max_unique=2048 rows (256 gather slots): with freq_remap packing
        # hot trigrams into dense group prefixes, a 1024-pair batch touches
        # ~107 row groups (measured, toy corpus at 8192 words) — 2.4x
        # headroom. The cap sizes the row-selection matmul and the gather
        # out-block, so slack is pure cost. max_trigrams_query=32 covers the
        # query side's p100 exactly (docs need the full 64).
        data=DataConfig(toy_vocab_words=8192, toy_num_pairs=65536,
                        freq_remap=True, max_unique=2048,
                        max_trigrams_query=32),
        train=TrainConfig(batch_size=1024),
    )


def _preset_cnn() -> RunConfig:
    """CNN-DSSM (CLSM): conv towers + max-pool over trigram windows.

    BASELINE.json:9.
    """
    return RunConfig(
        name="cnn",
        tower=TowerConfig(arch="cnn", vocab_size=30_000, embed_width=300,
                          conv_window=3, conv_channels=300, semantic_dim=128,
                          compute_dtype="bfloat16"),
        # B=1024 like the mlp presets: measured on v5e, 256->1024 lifts
        # throughput 159k -> 283k pairs/s (1.61 -> 3.62 ms/step) — B=256
        # left the chip underutilized (VERDICT r4 weak 3).
        train=TrainConfig(batch_size=1024),
    )


def _preset_lstm() -> RunConfig:
    """LSTM-DSSM: recurrent towers, final-state embeddings.

    BASELINE.json:10.
    """
    return RunConfig(
        name="lstm",
        tower=TowerConfig(arch="lstm", vocab_size=30_000, embed_width=300,
                          lstm_hidden=300, semantic_dim=128,
                          compute_dtype="bfloat16"),
        # B=1024: measured 256->1024 lifts 145k -> 229k pairs/s on v5e
        # (1.77 -> 4.48 ms/step); see the cnn preset note.
        train=TrainConfig(batch_size=1024),
    )


def _preset_multihost() -> RunConfig:
    """Multi-host DSSM: sharded embedding + global negative pool via all-gather.

    65k effective negatives on N>=2 hosts. BASELINE.json:11.
    """
    return RunConfig(
        name="multihost",
        tower=TowerConfig(arch="mlp", vocab_size=500_000, embed_width=300,
                          hidden_dims=(300,), semantic_dim=128,
                          compute_dtype="bfloat16"),
        data=DataConfig(toy_vocab_words=8192, toy_num_pairs=131072,
                        max_unique=16384, max_unique_rows=8192,
                        max_unique_rows_local=2048,
                        freq_remap=True, pipeline_workers=8,
                        # Fixed epoch order (the reference's pack order is
                        # fixed every epoch) + epoch batch cache: the
                        # 65,536-row global dedupe+reslot is the dominant
                        # host cost; from epoch 2 on it is a dict lookup
                        # (loader.batch_iterator, VERDICT r5 item 4).
                        reshuffle_each_epoch=False,
                        cache_epoch_batches=True),
        # Vocab-sharded embedding table (TP over 'model') + global negative
        # pool over 'data' — the two BASELINE.json:11 requirements.
        mesh=MeshConfig(data_parallel=-1, model_parallel=2,
                        global_negatives=True,
                        # Halves the mp gather psum + data-axis compact-grad
                        # psum wire; with the sel-basis grad this keeps the
                        # derived scaling efficiency >=90% out to dp=64
                        # (parallel/comm_model.py).
                        collective_dtype="bfloat16"),
        train=TrainConfig(batch_size=65536),
    )


PRESETS = {
    "tiny": _preset_tiny,
    "full": _preset_full,
    "cnn": _preset_cnn,
    "lstm": _preset_lstm,
    "multihost": _preset_multihost,
}


def validate(cfg: RunConfig) -> RunConfig:
    """Fail fast on invalid configs — at startup, not at first jitted step."""
    t, tr, d, l = cfg.tower, cfg.train, cfg.data, cfg.loss
    checks = [
        (t.arch in ("mlp", "cnn", "lstm"), f"tower.arch {t.arch!r}"),
        (t.activation in ("tanh", "relu"), f"tower.activation {t.activation!r}"),
        (tr.optimizer in ("sgd", "momentum", "adam"),
         f"train.optimizer {tr.optimizer!r}"),
        (tr.table_optimizer in ("sgd", "adagrad"),
         f"train.table_optimizer {tr.table_optimizer!r}"),
        (l.mode in ("in_batch", "rotate"), f"loss.mode {l.mode!r}"),
        (t.vocab_size > 1, f"tower.vocab_size {t.vocab_size}"),
        (tr.batch_size > 0, f"train.batch_size {tr.batch_size}"),
        (tr.steps_per_call >= 1, f"train.steps_per_call {tr.steps_per_call}"),
        (t.table_dtype in ("", "float32", "bfloat16", "int8"),
         f"tower.table_dtype {t.table_dtype!r}"),
    ]
    if t.table_dtype_resolved == "bfloat16":
        checks.append((d.dedup_lookup and tr.sparse_embed_update,
                       "tower.table_dtype='bfloat16' requires "
                       "data.dedup_lookup and train.sparse_embed_update "
                       "(stochastic-rounding updates run on the sparse "
                       "row-group path only)"))
    if t.table_dtype_resolved == "int8":
        checks.append((d.dedup_lookup and tr.sparse_embed_update,
                       "tower.table_dtype='int8' requires data.dedup_lookup "
                       "and train.sparse_embed_update (dequantized compact "
                       "path only)"))
        checks.append((tr.table_optimizer == "sgd",
                       "tower.table_dtype='int8' requires "
                       "table_optimizer='sgd' (the AdaGrad accumulator "
                       "column cannot live on the int8 grid)"))
        # DECISION (r5, VERDICT r4 item 7): int8 deliberately does NOT
        # compose with model_parallel>1. int8 is the memory-CAPACITY
        # option for the single-chip/mp=1 regime: it takes the 500k x 384
        # table from 768 MB (f32) to 192 MB + 2 MB scale so it fits
        # comfortably beside activations on one chip. The multihost preset
        # is mp=2, where the bf16 table is already 192 MB/chip — the exact
        # capacity int8 would buy — while keeping 8-bit-free update
        # numerics and the simpler SR scatter. Supporting int8 at mp>1
        # would add a sharded scale-gather + a sharded SR-to-grid scatter
        # for a configuration with no capacity need; if vocab grows past
        # what mp x bf16 covers, raising model_parallel is the intended
        # lever (it scales; int8's one-off 2x does not). Revisit only if a
        # deployment needs >2M-row vocabs on a 2-chip budget.
        checks.append((cfg.mesh.model_parallel == 1,
                       "tower.table_dtype='int8' is mp=1-only by design: "
                       "int8 is the single-chip capacity option; at mp>1 "
                       "the bf16 sharded table already provides the same "
                       "per-chip footprint (see decision note above)"))
        checks.append((t.shared_weights,
                       "tower.table_dtype='int8' requires shared_weights "
                       "(the dequantized union-dedupe path)"))
        checks.append((t.table_int8_headroom >= 1.0,
                       f"tower.table_int8_headroom {t.table_int8_headroom}"))
    checks.append((cfg.mesh.collective_dtype in ("float32", "bfloat16"),
                   f"mesh.collective_dtype {cfg.mesh.collective_dtype!r}"))
    checks.append((cfg.mesh.collective_dtype == "float32"
                   or tr.table_optimizer == "sgd",
                   "mesh.collective_dtype='bfloat16' requires "
                   "table_optimizer='sgd' (the AdaGrad accumulator column "
                   "rides the compact gather and would be bf16-rounded "
                   "every step)"))
    checks.append((not d.cache_epoch_batches or not d.reshuffle_each_epoch,
                   "data.cache_epoch_batches requires "
                   "reshuffle_each_epoch=False (the cached epoch-1 stream "
                   "must BE every later epoch's stream)"))
    if d.dedup_lookup:
        # DMA row-group alignment: 8 rows for f32 tables, 16 bf16, 32 int8.
        group = {4: 8, 2: 16, 1: 32}[
            __import__("numpy").dtype(t.table_dtype_resolved).itemsize
        ]
        checks.append((t.vocab_size % group == 0,
                       f"tower.vocab_size {t.vocab_size} must be a multiple "
                       f"of {group} with dedup_lookup (DMA row-group "
                       f"alignment for {t.table_dtype_resolved} tables)"))
        # max_unique is a row budget at f32 (8-row) granularity; the loader
        # scales it so the group-SLOT count (max_unique // 8) is constant
        # across table dtypes (data/loader.add_dedup_fields).
        checks.append((d.max_unique % 8 == 0,
                       f"data.max_unique {d.max_unique} must be a multiple "
                       "of 8"))
        checks.append(((d.max_unique // 8) * group <= t.vocab_size,
                       f"data.max_unique {d.max_unique} (x{group // 8} for "
                       f"{t.table_dtype_resolved} groups) must be <= "
                       f"vocab_size {t.vocab_size}"))
        # Dedupe pads unused slots with SKIP_SENTINEL_GID (1 << 25), which
        # must be out of range for every real group id.
        checks.append((t.vocab_size // group < (1 << 25),
                       f"tower.vocab_size {t.vocab_size} exceeds the dedupe "
                       f"skip-sentinel bound ({(1 << 25)} groups of {group})"))
    if tr.table_optimizer == "adagrad":
        checks.append((d.dedup_lookup and tr.sparse_embed_update,
                       "table_optimizer='adagrad' requires data.dedup_lookup "
                       "and train.sparse_embed_update"))
        # The per-row accumulator lives in the table's LAST lane-padding
        # column (train/sparse_update.table_update_vals) — the logical table
        # width must not already fill the 128-lane tile, or the first step
        # would silently corrupt a real weight column.
        logical_w = {"mlp": t.embed_width,
                     "cnn": t.conv_window * t.conv_channels,
                     "lstm": t.embed_width}[t.arch] if t.arch in (
                         "mlp", "cnn", "lstm") else 0
        checks.append((logical_w % 128 != 0,
                       f"table_optimizer='adagrad' needs a spare lane-padding "
                       f"column: logical table width {logical_w} is a "
                       f"multiple of 128 (widen/narrow tower.embed_width or "
                       f"conv dims by 1+)"))
    if l.mode == "rotate":
        checks.append((l.num_negatives < tr.batch_size,
                       f"loss.num_negatives {l.num_negatives} must be < "
                       f"batch_size {tr.batch_size}"))
    errors = [msg for ok, msg in checks if not ok]
    if errors:
        raise ValueError("invalid config: " + "; ".join(errors))
    return cfg


def get_preset(name: str) -> RunConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]()


def apply_overrides(cfg: RunConfig, overrides: dict) -> RunConfig:
    """Apply dotted-key CLI overrides: {"train.learning_rate": 0.05}."""
    for key, value in overrides.items():
        parts = key.split(".")
        if len(parts) == 1:
            cfg = dataclasses.replace(cfg, **{parts[0]: value})
            continue
        section = getattr(cfg, parts[0])
        leaf = section
        for p in parts[1:-1]:
            leaf = getattr(leaf, p)
        # Rebuild from the leaf outward
        def rebuild(obj, path, val):
            if len(path) == 1:
                fld = {f.name: f.type for f in dataclasses.fields(obj)}
                if path[0] not in fld:
                    raise KeyError(f"no field {path[0]!r} on {type(obj).__name__}")
                return dataclasses.replace(obj, **{path[0]: val})
            child = rebuild(getattr(obj, path[0]), path[1:], val)
            return dataclasses.replace(obj, **{path[0]: child})

        cfg = rebuild(cfg, parts, value)
    return cfg
