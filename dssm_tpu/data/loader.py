"""Host-side input pipeline: hash once, batch forever.

Reference mechanism (SURVEY.md §3.1 row 2 [R-high]): unpickle a CSR "pack",
slice rows per batch, convert to COO, feed via feed_dict every step. Here the
corpus is hashed once into fixed-length numpy arrays (the TPU-friendly sparse
encoding, see data/trigram.py) and batching is pure array slicing; device
transfer happens in the train loop via jax.device_put with a batch sharding.

Multi-host: each host deterministically owns a disjoint, equally-sized shard
of every global batch (same seed => same permutation on every host), so the
all-gathered doc-embedding pool lines up with the diagonal positive labels
(SURVEY.md §8 hard part 6).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, Optional

import numpy as np

from dssm_tpu.config import DataConfig, TowerConfig
from dssm_tpu.data import trigram
from dssm_tpu.data.toy import ToyPairs

Batch = Dict[str, np.ndarray]


@dataclass
class HashedPairs:
    """Whole corpus, pre-hashed. Bag fields always present; sequence fields
    only for cnn/lstm towers."""

    q_idx: np.ndarray  # [N, K] int32
    q_wgt: np.ndarray  # [N, K] f32
    d_idx: np.ndarray
    d_wgt: np.ndarray
    q_seq_idx: Optional[np.ndarray] = None  # [N, T, Kw]
    q_seq_wgt: Optional[np.ndarray] = None
    q_mask: Optional[np.ndarray] = None  # [N, T]
    d_seq_idx: Optional[np.ndarray] = None
    d_seq_wgt: Optional[np.ndarray] = None
    d_mask: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return self.q_idx.shape[0]


def hash_pairs(pairs: ToyPairs, tower: TowerConfig, data: DataConfig) -> HashedPairs:
    kq = data.max_trigrams_query or data.max_trigrams
    q_idx, q_wgt = trigram.hash_batch(
        pairs.queries, tower.vocab_size, kq, data.normalize_counts
    )
    d_idx, d_wgt = trigram.hash_batch(
        pairs.titles, tower.vocab_size, data.max_trigrams, data.normalize_counts
    )
    out = HashedPairs(q_idx=q_idx, q_wgt=q_wgt, d_idx=d_idx, d_wgt=d_wgt)
    if tower.is_sequence_model:
        out.q_seq_idx, out.q_seq_wgt, out.q_mask = trigram.hash_batch_sequence(
            pairs.queries, tower.vocab_size, data.max_words,
            data.max_trigrams_per_word, data.normalize_counts,
        )
        out.d_seq_idx, out.d_seq_wgt, out.d_mask = trigram.hash_batch_sequence(
            pairs.titles, tower.vocab_size, data.max_words,
            data.max_trigrams_per_word, data.normalize_counts,
        )
    return out


def add_dedup_fields(batch: Batch, max_unique: int, group: int = 8,
                     max_unique_rows: Optional[int] = None,
                     joint: bool = False) -> Batch:
    """Per-batch two-level index dedupe for the compact-gather + count-matmul
    lookup (kernels/dedup_embed.py). Dropped-overflow slots get weights
    zeroed. `group` must be the sublane group of the table dtype (8 f32 /
    16 bf16).

    joint=False (separate tower tables): adds {q,d}_uniq (row-GROUP ids),
    {q,d}_sel (unique-row slots), {q,d}_inv (slot per lookup).
    joint=True (SHARED table — the canonical config): one UNION dedupe over
    both sides, adding `uniq`, `sel`, and per-side {q,d}_inv — the train
    step then does ONE gather + ONE scatter for both towers.

    max_unique is a compact-row budget at f32 (8-row-group) granularity: the
    GROUP-SLOT budget max_unique // 8 is what actually binds (one DMA per
    slot), and it stays constant across table dtypes — a bf16 table (16-row
    groups) gathers the same number of groups, each twice as tall, for the
    same DMA byte count. Without this scaling a bf16 run would get half the
    slots and silently drop the rarest groups' lookups.
    """
    from dssm_tpu.kernels.dedup_embed import (
        dedupe_two_level, dedupe_two_level_joint)

    if max_unique_rows is None:
        max_unique_rows = max(256, max_unique // 8)
    max_unique = (max_unique // 8) * group
    out = dict(batch)
    if joint:
        uniq, sel, q_inv, d_inv, q_keep, d_keep = dedupe_two_level_joint(
            batch["q_idx"], batch["d_idx"], max_unique, max_unique_rows,
            group,
        )
        out["uniq"] = uniq
        out["sel"] = sel
        out["q_inv"] = q_inv
        out["d_inv"] = d_inv
        if not np.all(q_keep == 1.0):
            out["q_wgt"] = batch["q_wgt"] * q_keep
        if not np.all(d_keep == 1.0):
            out["d_wgt"] = batch["d_wgt"] * d_keep
        return out
    for side in ("q", "d"):
        uniq, sel, inv, keep = dedupe_two_level(
            batch[f"{side}_idx"], max_unique, max_unique_rows, group
        )
        out[f"{side}_uniq"] = uniq
        out[f"{side}_sel"] = sel
        out[f"{side}_inv"] = inv
        if not np.all(keep == 1.0):
            out[f"{side}_wgt"] = batch[f"{side}_wgt"] * keep
    return out


def select_batch(
    hashed: HashedPairs,
    rows: np.ndarray,
    sequence: bool,
    dedup_unique: Optional[int] = None,
    dedup_group: int = 8,
    dedup_unique_rows: Optional[int] = None,
    dedup_joint: bool = False,
) -> Batch:
    if sequence:
        batch = {
            "q_idx": hashed.q_seq_idx[rows],
            "q_wgt": hashed.q_seq_wgt[rows],
            "q_mask": hashed.q_mask[rows],
            "d_idx": hashed.d_seq_idx[rows],
            "d_wgt": hashed.d_seq_wgt[rows],
            "d_mask": hashed.d_mask[rows],
        }
    else:
        batch = {
            "q_idx": hashed.q_idx[rows],
            "q_wgt": hashed.q_wgt[rows],
            "d_idx": hashed.d_idx[rows],
            "d_wgt": hashed.d_wgt[rows],
        }
    if dedup_unique:
        batch = add_dedup_fields(batch, dedup_unique, dedup_group,
                                 dedup_unique_rows, dedup_joint)
    return batch


def _global_dedup_local_batch(
    hashed: HashedPairs,
    rows: np.ndarray,
    sequence: bool,
    dedup_unique: int,
    dedup_group: int,
    dedup_unique_rows: Optional[int],
    dedup_joint: bool,
    lo: int,
    local: int,
) -> Batch:
    """The multi-host global-dedupe branch, materializing only LOCAL arrays.

    The dedupe itself must see the GLOBAL batch's indices (uniq/sel are
    replicated across hosts), but everything else — weights, masks, inv
    slices, keep multiplies — is only needed for this host's shard. The old
    path built the full global batch dict and then sliced: at the multihost
    preset that is ~4 global 16-33 MB fancy-gathers plus global-size keep
    multiplies per step, which measured comparable to the dedupe itself.
    Bit-identical outputs to select_batch(global)+slice (tests/
    test_multihost.py parity matrix).
    """
    from dssm_tpu.kernels.dedup_embed import (
        dedupe_two_level, dedupe_two_level_joint)

    if sequence:
        q_idx_g, d_idx_g = hashed.q_seq_idx[rows], hashed.d_seq_idx[rows]
    else:
        q_idx_g, d_idx_g = hashed.q_idx[rows], hashed.d_idx[rows]
    if dedup_unique_rows is None:
        dedup_unique_rows = max(256, dedup_unique // 8)
    max_u = (dedup_unique // 8) * dedup_group
    sl = slice(lo, lo + local)
    loc = rows[sl]
    out: Batch = {"q_idx": q_idx_g[sl], "d_idx": d_idx_g[sl]}
    if sequence:
        out["q_wgt"] = hashed.q_seq_wgt[loc]
        out["d_wgt"] = hashed.d_seq_wgt[loc]
        out["q_mask"] = hashed.q_mask[loc]
        out["d_mask"] = hashed.d_mask[loc]
    else:
        out["q_wgt"] = hashed.q_wgt[loc]
        out["d_wgt"] = hashed.d_wgt[loc]
    if dedup_joint:
        uniq, sel, q_inv, d_inv, q_keep, d_keep = dedupe_two_level_joint(
            q_idx_g, d_idx_g, max_u, dedup_unique_rows, dedup_group)
        out["uniq"], out["sel"] = uniq, sel
        out["q_inv"], out["d_inv"] = q_inv[sl], d_inv[sl]
        keeps = {"q": q_keep, "d": d_keep}
    else:
        keeps = {}
        for side, idx_g in (("q", q_idx_g), ("d", d_idx_g)):
            uniq, sel, inv, keep = dedupe_two_level(
                idx_g, max_u, dedup_unique_rows, dedup_group)
            out[f"{side}_uniq"] = uniq
            out[f"{side}_sel"] = sel
            out[f"{side}_inv"] = inv[sl]
            keeps[side] = keep
    for side, keep in keeps.items():
        kl = keep[sl]
        if not np.all(kl == 1.0):
            out[f"{side}_wgt"] = out[f"{side}_wgt"] * kl
    return out


def reslot_local(batch: Batch, cap: int, shards: int = 1) -> Batch:
    """Third dedupe level: re-slot each data shard's lookups into its OWN
    compact slot space (VERDICT r4: the measured composed multihost step is
    dominated by count/select work at the GLOBAL unique-row width).

    The global two-level dedupe produces `sel` [u2_global] (compact row per
    unique-row slot, replicated across hosts — u2_global must cover the
    whole 65,536-row global batch, e.g. 8192). But each host's B_local rows
    touch only a fraction of those slots, and the on-device count build is
    O(B_local x K x width) while the row-select matmul is O(width x gr x h).
    Re-slotting shrinks width from u2_global to `cap` per shard.

    Emits `sel_local` [shards, cap] — sel_local[s, j] is the GLOBAL
    UNIQUE-ROW SLOT (index into `sel`) of shard s's j-th local slot — and
    rewrites {q,d}_inv into local slot ids. Lookups whose slot overflows the
    cap get their weight zeroed (same policy as the global levels). `sel`
    is KEPT: the SPMD step selects each shard's rows from the replicated
    rows2 = compact[sel] (sel basis), so the implicit data-axis psum of the
    compact gradient rides the u2-wide sel basis instead of the
    group-padded compact basis — 2x (f32) to 4x (bf16 tables) less
    all-reduce traffic (parallel/comm_model.py, VERDICT r5 item 5). Rows
    are split into `shards` contiguous blocks matching the mesh's
    contiguous batch partitioning."""
    sel = batch["sel"]
    out = dict(batch)
    b = batch["q_inv"].shape[0]
    if b % shards:
        raise ValueError(f"batch {b} not divisible by {shards} shards")
    rows_per = b // shards
    sel_local = np.zeros((shards, cap), dtype=sel.dtype)
    q_inv = np.ascontiguousarray(batch["q_inv"]).copy()
    d_inv = np.ascontiguousarray(batch["d_inv"]).copy()
    q_wgt = np.array(batch["q_wgt"], copy=True)
    d_wgt = np.array(batch["d_wgt"], copy=True)
    for s in range(shards):
        sl = slice(s * rows_per, (s + 1) * rows_per)
        qi, di = q_inv[sl], d_inv[sl]
        qw, dw = q_wgt[sl], d_wgt[sl]
        both = np.concatenate([qi.reshape(-1), di.reshape(-1)])
        live = np.concatenate([(qw != 0).reshape(-1), (dw != 0).reshape(-1)])
        used, counts = np.unique(both[live], return_counts=True)
        if used.size > cap:
            keep = np.argsort(-counts, kind="stable")[:cap]
            keep.sort()
            used = used[keep]
        remap = np.zeros((int(sel.shape[0]),), dtype=np.int32)
        hit = np.zeros((int(sel.shape[0]),), dtype=bool)
        remap[used] = np.arange(used.size, dtype=np.int32)
        hit[used] = True
        sel_local[s, :used.size] = used
        for inv, wgt in ((qi, qw), (di, dw)):
            ok = hit[inv]
            wgt[~ok] = 0
            inv[...] = np.where(ok, remap[inv], 0)
    out["sel_local"] = sel_local
    out["q_inv"], out["d_inv"] = q_inv, d_inv
    out["q_wgt"], out["d_wgt"] = q_wgt, d_wgt
    return out


def sort_batch_rows(batch: Batch) -> Batch:
    """Jointly permute the batch's rows (q and d together, so diagonal
    positive labels stay aligned) by descending trigram count. Short texts
    then cluster into the same kernel row tiles, whose K-unroll bound
    (kernels/pallas_count._tile_kmax) stops at the tile's longest row — the
    count build is the largest on-device compute stage and its work is
    O(rows x K), so clustering converts per-corpus K padding into skipped
    chunks. Pure within-batch permutation of (query, doc) PAIRS: the
    in-batch loss, its gradient, and eval metrics are order-invariant.
    Replicated dedup fields (uniq/sel) pass through untouched."""
    key_d = (batch["d_wgt"] != 0).sum(axis=1)
    key_q = (batch["q_wgt"] != 0).sum(axis=1)
    if key_d.ndim != 1:  # sequence batches: no count kernel, nothing to win
        return batch
    perm = np.lexsort((-key_q, -key_d))
    out = {}
    for k, v in batch.items():
        if (k in ("uniq", "sel", "sel_local")
                or k.endswith(("_uniq", "_sel"))):
            out[k] = v
        else:
            out[k] = v[perm]
    return out


class LockedIterator:
    """Serialize ``next()`` calls on a shared iterator across threads.

    Python generators raise ``ValueError('generator already executing')``
    when two threads call next concurrently — which can happen in cli/train
    when the stacked-block worker thread and the main loop's tail path share
    one prefetch stream. Interleaving order across consumers is unspecified
    but each batch is delivered exactly once."""

    def __init__(self, iterator):
        import threading

        self._it = iter(iterator)
        self._lock = threading.Lock()

    def __iter__(self):
        return self

    def __next__(self):
        with self._lock:
            return next(self._it)


def wire_dtype_plan(
    hashed: HashedPairs,
    dedup_unique: int,
    dedup_unique_rows: Optional[int],
) -> Dict[str, bool]:
    """Decide the compressed wire dtypes ONCE from whole-run invariants.

    Per-batch decisions (the old behavior) let a single outlier batch flip
    the wire dtype mid-run: np.stack in stack_batches silently promotes
    mixed blocks and the jitted multi-step recompiles on the new dtype
    signature. Instead:

      - inv int16 iff the unique-row slot bound (max_unique_rows, or
        add_dedup_fields' default) keeps every slot id < 32768 — a config
        invariant.
      - wgt uint8 iff every weight in the corpus is a small non-negative
        integer (one O(corpus) scan here; keep-mask multiplies in
        add_dedup_fields only zero entries, preserving the property).
    """
    slots = (dedup_unique_rows if dedup_unique_rows is not None
             else max(256, dedup_unique // 8))
    u8 = True
    for arr in (hashed.q_wgt, hashed.d_wgt):
        if arr is None or arr.dtype != np.float32:
            u8 = False
            break
        if arr.size and not (
            float(arr.min(initial=0.0)) >= 0.0
            and float(arr.max(initial=0.0)) <= 255.0
            and np.array_equal(arr.astype(np.uint8).astype(np.float32), arr)
        ):
            u8 = False
            break
    return {"inv_int16": slots <= 32768, "wgt_uint8": u8}


def compress_wire(batch: Batch, plan: Optional[Dict[str, bool]] = None) -> Batch:
    """Shrink the host->device wire format of a dedup batch. The relay/PCIe
    transfer is the e2e train bottleneck (measured ~70 MB/s effective through
    the axon tunnel vs a 0.7 ms device step), so every byte shipped per step
    counts:

      - {q,d}_idx are DROPPED when inv fields exist: the dedup step consumes
        only uniq/sel/inv/wgt (train/sparse_update.py step) — idx is dead
        weight (528 KB of a 1.58 MB Full-DSSM batch).
      - {q,d}_inv int32 -> int16 when the unique-row slot count fits (slots
        < 32768; data.max_unique_rows bounds it).
      - {q,d}_wgt f32 -> uint8 when every weight is a small integral count
        (trigram counts with normalize_counts=False; checked per batch).

    The device side casts back at the lookup boundary
    (kernels/dedup_embed.lookup_from_compact) — int16/uint8 -> int32/f32 are
    free VPU converts next to a matmul. Lossless by construction.

    `plan` (wire_dtype_plan) fixes the target dtypes for the whole run so
    every batch ships an identical dtype signature (no mid-run recompiles);
    without it, dtypes are decided per batch (legacy behavior, used by
    tests)."""
    out = dict(batch)
    for side in ("q", "d"):
        if f"{side}_inv" not in out:
            continue
        out.pop(f"{side}_idx", None)
        inv = out[f"{side}_inv"]
        if inv.dtype == np.int32:
            ok = (plan["inv_int16"] if plan is not None
                  else bool(inv.size and inv.max() < 32768))
            if ok:
                out[f"{side}_inv"] = inv.astype(np.int16)
        wgt = out[f"{side}_wgt"]
        if wgt.dtype == np.float32:
            if plan is not None:
                if plan["wgt_uint8"]:
                    out[f"{side}_wgt"] = wgt.astype(np.uint8)
            elif (wgt.size
                    and float(wgt.max(initial=0.0)) <= 255.0
                    and float(wgt.min(initial=0.0)) >= 0.0):
                w8 = wgt.astype(np.uint8)
                if np.array_equal(w8.astype(np.float32), wgt):
                    out[f"{side}_wgt"] = w8
    return out


def batch_iterator(
    hashed: HashedPairs,
    global_batch: int,
    sequence: bool = False,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    drop_remainder: bool = True,
    dedup_unique: Optional[int] = None,
    dedup_group: int = 8,
    dedup_unique_rows: Optional[int] = None,
    dedup_joint: bool = False,
    wire_compress: bool = False,
    sort_rows: bool = False,
    pipeline_workers: int = 0,
    local_sel_cap: int = 0,
    local_sel_shards: int = 1,
    start_batch: int = 0,
    reshuffle_each_epoch: bool = True,
    cache_epoch_batches: bool = False,
) -> Iterator[Batch]:
    """Infinite epoch-shuffled iterator over per-host batch shards.

    Every host computes the identical global permutation (seeded numpy RNG),
    takes rows [global_batch] per step, then slices its own contiguous
    process shard — shard h gets rows [h*B_local, (h+1)*B_local). Positive
    labels after the all-gather are diagonal offset h*B_local.

    start_batch is the DATA CURSOR (SURVEY.md §6.4; VERDICT r5 item 2): the
    number of batches already consumed by a previous incarnation of this
    run. The stream fast-forwards by pure index math on the deterministic
    per-epoch permutation — epoch = start_batch // batches_per_epoch, offset
    = start_batch % batches_per_epoch — so a resumed run continues the data
    stream exactly where the checkpoint left it instead of silently
    replaying epoch 0. Every train step consumes exactly one batch (the
    K-scan path consumes K batches for K steps), so the cursor IS
    TrainState.step; cli/train passes it on resume.

    pipeline_workers > 1 farms the per-batch transform (gather + dedupe +
    compress — the expensive part; the C++ dedupe releases the GIL) to a
    thread pool with ORDERED reassembly: batch order and content are
    bit-identical to the serial path, but W upcoming batches build
    concurrently. This is how a many-core production host amortizes the
    per-step global-batch dedupe below the device step time (the dedupe
    itself is also internally threaded — DSSM_DEDUPE_THREADS).

    reshuffle_each_epoch=False fixes the epoch permutation to (seed, 0) —
    the reference-faithful fixed pack order — and with
    cache_epoch_batches=True the finished batch dicts (dedupe + reslot +
    compress output) are memoized during epoch 1 and replayed afterwards:
    steady-state host cost per step becomes one dict lookup (VERDICT r5
    item 4). Cached batches are shared objects — consumers must treat
    batches as read-only (they all do: stacking/device_put/copy-on-write
    transforms only).
    """
    n = len(hashed)
    if global_batch % process_count != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {process_count} hosts"
        )
    local = global_batch // process_count
    if global_batch > n:
        raise ValueError(f"global batch {global_batch} > corpus size {n}")
    # Fix the compressed wire dtypes once for the whole run (stable jit
    # signature across batches; see wire_dtype_plan).
    plan = (wire_dtype_plan(hashed, dedup_unique or 0, dedup_unique_rows)
            if wire_compress else None)

    def row_stream() -> Iterator:
        batches_per_epoch = n // global_batch
        epoch, skip = divmod(max(0, start_batch), batches_per_epoch)
        while True:
            rng = np.random.default_rng(
                (seed, epoch if reshuffle_each_epoch else 0))
            perm = rng.permutation(n)
            for bi, start in enumerate(
                    range(skip * global_batch, n - global_batch + 1,
                          global_batch), start=skip):
                yield bi, perm[start : start + global_batch]
            epoch += 1
            skip = 0

    # Epoch batch cache (reference-faithful fixed order only): finished
    # batch dicts keyed by in-epoch batch index.
    epoch_cache: Optional[Dict[int, Batch]] = (
        {} if cache_epoch_batches and not reshuffle_each_epoch else None)

    def make_uncached(rows: np.ndarray) -> Batch:
        if dedup_unique and process_count > 1:
            # Dedupe over the GLOBAL batch (identical on every host — same
            # seed, same permutation) so the *_uniq fields are truly
            # replicated across hosts; weights/inv/keep are materialized
            # for this host's shard only (_global_dedup_local_batch).
            out = _global_dedup_local_batch(
                hashed, rows, sequence, dedup_unique, dedup_group,
                dedup_unique_rows, dedup_joint, process_index * local, local)
        else:
            shard = rows[process_index * local : (process_index + 1) * local]
            out = select_batch(hashed, shard, sequence, dedup_unique,
                               dedup_group, dedup_unique_rows, dedup_joint)
        if sort_rows:
            out = sort_batch_rows(out)
        if local_sel_cap and "sel" in out:
            # Third dedupe level: per-data-shard slot spaces (reslot_local).
            out = reslot_local(out, local_sel_cap, local_sel_shards)
        return compress_wire(out, plan) if wire_compress else out

    def make(job) -> Batch:
        bi, rows = job
        if epoch_cache is not None:
            hit = epoch_cache.get(bi)
            if hit is not None:
                return hit
        out = make_uncached(rows)
        if epoch_cache is not None:
            epoch_cache[bi] = out
        return out

    rs = row_stream()
    if pipeline_workers and pipeline_workers > 1:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=pipeline_workers)
        # With the epoch cache on a short epoch (bpe < W+1: the multihost
        # preset is bpe=2, W=8), the prefill would submit several EPOCHS of
        # jobs before any epoch-1 make completes — every one a cache miss
        # running the dominant global dedupe redundantly. Memoize the
        # FUTURE per in-epoch batch index: duplicate indices share one
        # computation; result() is idempotent across yields.
        fut_memo: Optional[Dict[int, object]] = (
            {} if epoch_cache is not None else None)

        def submit(job):
            if fut_memo is None:
                return ex.submit(make, job)
            f = fut_memo.get(job[0])
            if f is None:
                f = ex.submit(make, job)
                fut_memo[job[0]] = f
            return f

        try:
            futs: "deque" = deque()
            for _ in range(pipeline_workers + 1):
                futs.append(submit(next(rs)))
            while True:
                batch = futs.popleft().result()
                futs.append(submit(next(rs)))
                yield batch
        finally:
            # Non-blocking teardown: this runs from generator finalization,
            # possibly during interpreter shutdown, where module globals may
            # already be torn down — swallow everything.
            try:
                ex.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass
    else:
        for job in rs:
            yield make(job)


def prefetch(iterator: Iterator[Batch], depth: int = 2) -> Iterator[Batch]:
    """Run the host-side batch pipeline (slicing + dedupe) in a background
    thread so it overlaps device steps. The C++ hashing path releases the GIL
    (native/dssm_native.cpp), so the overlap is real."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                q.put(item)
        finally:
            q.put(None)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()


def eval_batches(
    hashed: HashedPairs, batch: int, sequence: bool = False,
    dedup_unique: Optional[int] = None, dedup_group: int = 8,
    dedup_unique_rows: Optional[int] = None,
    dedup_joint: bool = False,
    wire_compress: bool = False,
    pipeline_workers: int = 0,
) -> Iterator[Batch]:
    """One pass over the eval corpus in order, including the ragged tail
    (a tail batch costs one extra jit specialization in eval — fine).

    wire_compress shrinks host->device bytes exactly as in training (the
    embed path consumes inv/wgt, so idx is dead weight); pipeline_workers
    farms the per-batch dedupe to a thread pool with ordered reassembly —
    at a 65,536-pair corpus the serial host dedupe dominates eval
    wall-clock (measured)."""
    n = len(hashed)
    plan = (wire_dtype_plan(hashed, dedup_unique or 0, dedup_unique_rows)
            if wire_compress else None)

    def make(start: int) -> Batch:
        rows = np.arange(start, min(start + batch, n))
        out = select_batch(hashed, rows, sequence, dedup_unique, dedup_group,
                           dedup_unique_rows, dedup_joint)
        return compress_wire(out, plan) if wire_compress else out

    starts = range(0, n, batch)
    if pipeline_workers and pipeline_workers > 1:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=pipeline_workers)
        try:
            futs: "deque" = deque()
            it = iter(starts)
            for s in it:
                futs.append(ex.submit(make, s))
                if len(futs) > pipeline_workers + 1:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()
        finally:
            try:
                ex.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass
    else:
        for s in starts:
            yield make(s)
