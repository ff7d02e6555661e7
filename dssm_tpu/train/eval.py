"""Retrieval evaluation: Recall@K and NDCG@K.

Reference: `accuracy` = fraction of rows where the positive out-ranks the NEG
sampled candidates (SURVEY.md §3.1 row 7 [R-high]). The parity metrics for
the build are Recall@1 and NDCG@10 over the full eval corpus (every query
ranked against every eval doc, true doc = aligned title) — BASELINE.json:2.

Eval runs the SAME fast path as training (VERDICT round 1 item 6): batches
carry the dedup compact-gather fields, the tail batch is PADDED to the full
batch size so one jit specialization (and the Pallas kernels' shape
alignment) serves every batch, and ranking is computed chunk-by-chunk on
device — the [N, N] score matrix never materializes on the host.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dssm_tpu.config import RunConfig
from dssm_tpu.data.loader import HashedPairs, eval_batches
from dssm_tpu.models import base as model_base

_RANK_CHUNK = 1024


def _pad_batch(batch: Dict[str, np.ndarray], to_rows: int) -> Dict:
    """Pad every batch-dim field to `to_rows` rows (repeating row 0; padded
    rows are sliced off the embeddings afterwards). Replicated dedup fields
    ({q,d}_uniq/_sel) are row-count independent and pass through."""
    out = {}
    for k, v in batch.items():
        if (k in ("uniq", "sel", "sel_local")
                or k.endswith(("_uniq", "_sel"))):
            out[k] = v
            continue
        n = v.shape[0]
        if n == to_rows:
            out[k] = v
        else:
            pad = np.repeat(v[:1], to_rows - n, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
    return out


@functools.lru_cache(maxsize=32)
def _embed_fwd(tower_cfg, impl: str, sides: str):
    """Jitted two-tower forward, cached on the (hashable frozen) tower
    config — a closure re-jitted per embed_corpus call would recompile
    every eval pass."""

    @jax.jit
    def fwd(p, batch):
        return tuple(
            model_base.embed(p, tower_cfg, s, batch, impl=impl)
            for s in sides
        )

    return fwd


@functools.lru_cache(maxsize=32)
def _embed_fwd_stacked(tower_cfg, impl: str, sides: str):
    """K batches per device dispatch: jitted (params, stacked) ->
    [K, B, D] per side, the forward mirror of train's
    make_multi_train_step. One dispatch + one host fetch amortize the
    per-call relay latency (~0.5-1 ms on the axon tunnel) over K batches —
    the fix for the 386x train/eval throughput gap (VERDICT r2 weak 2:
    eval paid dispatch + fetch + host dedupe per 256-row batch)."""

    @jax.jit
    def fwd(p, stacked):
        def one(_, batch):
            return None, tuple(
                model_base.embed(p, tower_cfg, s, batch, impl=impl)
                for s in sides
            )

        _, out = jax.lax.scan(one, None, stacked)
        return out

    return fwd


def _host_blocks(cfg: RunConfig, hashed: HashedPairs, batch_size: int,
                 group: int, k_block: int):
    """Yield (stacked_numpy_block, live_rows) K-blocks through the full host
    pipeline (slicing + two-level dedupe + wire compression + K-stacking).

    Host-side batching (slicing + two-level dedupe, C++ data-plane) runs in
    a worker pool + prefetch thread, overlapping device dispatches; the
    compressed wire format cuts H2D bytes ~4x (both measured to dominate
    eval wall-clock at a 65,536-pair corpus)."""
    dedup = cfg.data.dedup_lookup
    from dssm_tpu.data.loader import prefetch

    batches = prefetch(eval_batches(
        hashed, batch_size, cfg.tower.is_sequence_model,
        dedup_unique=cfg.data.max_unique if dedup else None,
        dedup_group=group,
        dedup_unique_rows=cfg.data.max_unique_rows if dedup else None,
        dedup_joint=cfg.tower.shared_weights,
        wire_compress=dedup and not cfg.tower.is_sequence_model,
        pipeline_workers=max(2, cfg.data.pipeline_workers),
    ), depth=4)

    done = False
    while not done:
        block, rows = [], 0
        for batch in batches:
            n = batch["q_wgt"].shape[0]
            rows += n
            block.append(_pad_batch(batch, batch_size) if n < batch_size
                         else batch)
            if len(block) == k_block:
                break
        else:
            done = True
        if not block:
            break
        while len(block) < k_block:  # tail: repeat last batch, slice off below
            block.append(block[-1])
        yield {key: np.stack([b[key] for b in block])
               for key in block[0]}, rows


class EvalCache:
    """Cache of the stacked eval blocks (VERDICT r5 item 1).

    The eval corpus is FIXED for a run, yet every `evaluate` call used to
    re-hash, re-dedupe, re-compress, and re-ship it — eval measured 37x
    under the train contract metric at the 65k corpus (BENCH_r04), and the
    host+H2D share was exactly the re-paid part. The FIRST eval fills the
    cache streamingly (the host pipeline still overlaps device dispatches);
    every later eval pays only the embed forward + rank.

    With a single device (the real-chip case) blocks are pinned in HBM
    (~20 MB for the 65k corpus in compressed wire), eliminating the
    per-eval H2D too; with a multi-device mesh the host numpy stacks are
    kept and jit places them against the sharded params as usual."""

    def __init__(self, batch_size: int, k_block: int):
        self.batch_size = batch_size
        self.k_block = k_block
        self.blocks: list = []  # [(stacked dict, live rows)]
        self.complete = False
        self.on_device = jax.device_count() == 1

    def fill_from(self, src):
        """Yield blocks from `src`, storing each (device-resident when a
        single device serves eval). Marks the cache complete only when the
        source is exhausted — an aborted pass never registers."""
        for stacked, rows in src:
            if self.on_device:
                stacked = jax.device_put(stacked)
            self.blocks.append((stacked, rows))
            yield stacked, rows
        self.complete = True


# [(key, weakref-to-hashed, EvalCache)]; tiny LRU — one eval corpus per run.
_EVAL_CACHES: list = []
_EVAL_CACHE_CAP = 4


def _k_block(n_total: int, batch_size: int) -> int:
    # K batches per dispatch (lax.scan) + ONE stacked [K, B, D] fetch per
    # block; the ragged tail block is padded to a full K x B so a second
    # compiled shape serves every corpus size. Cap 64: at the full preset's
    # 65,536-pair corpus that is 4 dispatches instead of 16 (each dispatch
    # round-trip costs ~40 ms through the relay); the [64, B, D] stacked
    # outputs are still only ~8 MB.
    return max(1, min(64, (n_total + batch_size - 1) // batch_size))


def _cache_key(cfg: RunConfig, hashed: HashedPairs, batch_size: int,
               group: int):
    """Corpus object identity + every config field that shapes batch
    content; a weakref guards against id() reuse."""
    return (id(hashed), batch_size, group, cfg.data.dedup_lookup,
            cfg.data.max_unique, cfg.data.max_unique_rows,
            cfg.tower.shared_weights, cfg.tower.is_sequence_model)


def _registry_get(key, hashed) -> Optional["EvalCache"]:
    # Entries whose corpus has been garbage-collected are unmatchable
    # forever but would pin their device-resident blocks in HBM until
    # evicted by the LRU cap — drop them eagerly.
    _EVAL_CACHES[:] = [e for e in _EVAL_CACHES if e[1]() is not None]
    for k, ref, cache in _EVAL_CACHES:
        if k == key and ref() is hashed and cache.complete:
            return cache
    return None


def _registry_put(key, hashed, cache: "EvalCache") -> None:
    import weakref

    _EVAL_CACHES[:] = [e for e in _EVAL_CACHES
                       if e[0] != key and e[1]() is not None]
    _EVAL_CACHES.append((key, weakref.ref(hashed), cache))
    while len(_EVAL_CACHES) > _EVAL_CACHE_CAP:
        _EVAL_CACHES.pop(0)


def embed_corpus(
    params,
    cfg: RunConfig,
    hashed: HashedPairs,
    batch_size: int = 256,
    impl: str = "xla",
    *,
    device: bool = False,
    cache=None,
):
    """Forward-only embed of the whole eval corpus -> (Q [N, D], Dm [N, D]).

    Uses the dedup compact-gather lookup (the training fast path) whenever
    the config enables it; tail batches are padded so every batch hits the
    same compiled executable.

    device=True keeps the embeddings ON DEVICE (returns jnp arrays) — the
    eval path ranks on device anyway, and fetching [N, D] floats through the
    axon relay costs ~170 ms per 4 MB (measured); only `evaluate`'s final
    [N] rank vector should ever cross back.

    cache: an EvalCache, True (use/populate the registry), or None/False
    (re-run the host pipeline — the pre-r5 behavior).
    """
    from dssm_tpu.kernels.pallas_gather import sublane_group

    table = params[next(iter(params))][model_base.TABLE_KEY[cfg.tower.arch]]
    group = sublane_group(table.dtype)
    n_total = len(hashed)
    k_block = _k_block(n_total, batch_size)

    if cache is True:
        key = _cache_key(cfg, hashed, batch_size, group)
        hit = _registry_get(key, hashed)
        if hit is not None:
            block_iter = iter(hit.blocks)
        else:
            # Miss: fill streamingly during THIS pass (host pipeline still
            # overlaps device dispatches), register once complete.
            fresh = EvalCache(batch_size, k_block)
            _registry_put(key, hashed, fresh)
            block_iter = fresh.fill_from(
                _host_blocks(cfg, hashed, batch_size, group, k_block))
    elif isinstance(cache, EvalCache):
        if cache.complete:
            block_iter = iter(cache.blocks)
        else:
            # Fresh or aborted explicit cache: (re)fill it this pass — a
            # partial block list would silently evaluate a truncated
            # corpus.
            cache.blocks.clear()
            block_iter = cache.fill_from(
                _host_blocks(cfg, hashed, batch_size, group, k_block))
    else:
        block_iter = _host_blocks(cfg, hashed, batch_size, group, k_block)
    fwd_stacked = _embed_fwd_stacked(cfg.tower, impl, "qd")

    qs, ds = [], []
    pending = []
    for stacked, rows in block_iter:
        q, d = fwd_stacked(params, stacked)
        if device:
            # Slice on device (async); nothing crosses to the host.
            qs.append(q.reshape(-1, q.shape[-1])[:rows])
            ds.append(d.reshape(-1, d.shape[-1])[:rows])
            continue
        # Async dispatch: fetch the PREVIOUS block while this one computes.
        pending.append(((q, d), rows))
        if len(pending) > 1:
            (q0, d0), r0 = pending.pop(0)
            qs.append(np.asarray(q0).reshape(-1, q0.shape[-1])[:r0])
            ds.append(np.asarray(d0).reshape(-1, d0.shape[-1])[:r0])
    for (q0, d0), r0 in pending:
        qs.append(np.asarray(q0).reshape(-1, q0.shape[-1])[:r0])
        ds.append(np.asarray(d0).reshape(-1, d0.shape[-1])[:r0])
    if device:
        return jnp.concatenate(qs), jnp.concatenate(ds)
    return np.concatenate(qs), np.concatenate(ds)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _rank_all(q: jax.Array, d: jax.Array, chunk: int, dchunk: int
              ) -> jax.Array:
    """All chunks in ONE dispatch (lax.scan over query chunks x doc chunks):
    each relay round-trip costs ~40 ms, so per-chunk dispatches dominated
    eval. The doc axis is ALSO chunked (r5): a [1024, 65536] f32 score
    block is 268 MB — far past VMEM — so the single-level scan paid a full
    HBM round trip on every score; [chunk, dchunk] blocks keep scores
    on-chip (measured 84 -> 36 ms at 65536x65536 on v5e).

    rank = 1 + #docs scoring STRICTLY above the true doc. The self column
    is excluded by an explicit index mask (not by comparing the true score
    against itself inside the matmul), so the comparison cannot be flipped
    by last-ulp differences between the row-dot true score and the blocked
    matmul's value for the same entry; ranks match the previous
    same-matmul extraction exactly (0/65536 mismatches measured)."""
    n, nd = q.shape[0], d.shape[0]
    true_c = jnp.sum(q * d[:n], axis=1)  # aligned true doc per query
    npad = -n % chunk
    if npad:
        q = jnp.pad(q, ((0, npad), (0, 0)))
        true_c = jnp.pad(true_c, (0, npad))
    dpad = -nd % dchunk
    if dpad:
        d = jnp.pad(d, ((0, dpad), (0, 0)))
    nc, ndc = q.shape[0] // chunk, d.shape[0] // dchunk

    def one_q(lo, qc, tc):
        rows = lo + jnp.arange(chunk, dtype=jnp.int32)

        def dbody(cnt, j):
            c0 = j * dchunk
            db = jax.lax.dynamic_slice_in_dim(d, c0, dchunk)
            s = jnp.dot(qc, db.T, preferred_element_type=jnp.float32)
            colid = c0 + jnp.arange(dchunk, dtype=jnp.int32)
            live = (colid[None, :] != rows[:, None]) & (colid[None, :] < nd)
            return cnt + jnp.sum(
                ((s > tc[:, None]) & live).astype(jnp.int32), axis=1), None

        cnt, _ = jax.lax.scan(dbody, jnp.zeros((chunk,), jnp.int32),
                              jnp.arange(ndc, dtype=jnp.int32))
        return cnt

    def qbody(lo, qc_tc):
        qc, tc = qc_tc
        return lo + chunk, one_q(lo, qc, tc)

    _, cnts = jax.lax.scan(qbody, jnp.int32(0),
                           (q.reshape(nc, chunk, -1),
                            true_c.reshape(nc, chunk)))
    return 1 + cnts.reshape(-1)[:n]


_DOC_CHUNK = 4096


def compute_ranks(q: np.ndarray, d: np.ndarray,
                  chunk: int = _RANK_CHUNK) -> np.ndarray:
    """Per-query rank of the aligned true doc, computed on device — no
    [N, N] host matrix, one dispatch, one [N]-int fetch.

    MEASURED NEGATIVE RESULT (r5): a streaming Pallas rank kernel
    (kernels/pallas_rank.py — compare+count fused into the blockwise
    matmul, VMEM-only score blocks, predicated self/pad corrections) is
    rank-exact but measures 42.5 ms vs this XLA scan's 40.4 at 65k x 65k
    on v5e: both are bound by the f32 [N, N, 128] matmul itself (v5e
    executes f32 matmuls as multi-pass bf16), so removing the HBM block
    round-trips buys nothing the d-chunking didn't already. The kernel
    ships parity-tested for future wider-embedding configs; the XLA scan
    stays the default. Don't retry without dropping matmul precision."""
    qd, dd = jnp.asarray(q), jnp.asarray(d)
    return np.asarray(_rank_all(qd, dd, min(chunk, q.shape[0]),
                                min(_DOC_CHUNK, d.shape[0])))


def metrics_from_ranks(ranks: np.ndarray, ks=(1, 10)) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for k in ks:
        out[f"recall@{k}"] = float((ranks <= k).mean())
    out["ndcg@10"] = float(
        np.where(ranks <= 10, 1.0 / np.log2(1 + ranks), 0.0).mean())
    out["mrr"] = float((1.0 / ranks).mean())
    out["num_queries"] = float(ranks.shape[0])
    return out


def ranking_metrics(q: np.ndarray, d: np.ndarray, ks=(1, 10)) -> Dict[str, float]:
    """q, d: [N, D] unit vectors; true doc for query i is d[i].

    rank_i = 1 + #docs scoring strictly higher than the true doc (ties break
    in the model's favor; with continuous embeddings exact ties are
    measure-zero).
    """
    return metrics_from_ranks(compute_ranks(q, d), ks)


def evaluate(
    params,
    cfg: RunConfig,
    hashed: HashedPairs,
    batch_size: int = 256,
    impl: str = "xla",
    cache=True,
) -> Dict[str, float]:
    # Embeddings stay on device end-to-end; only the [N] rank vector (and
    # the scalar metrics) ever cross the host boundary. The eval corpus's
    # host pipeline + H2D are cached across calls (EvalCache) — the corpus
    # is fixed, so only the embed forward + rank depend on params.
    q, d = embed_corpus(params, cfg, hashed, batch_size, impl, device=True,
                        cache=cache)
    return ranking_metrics(q, d)
