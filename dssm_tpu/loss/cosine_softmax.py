"""Cosine-similarity softmax cross-entropy over in-batch negatives.

Reference mechanism (SURVEY.md §3.1 rows 4-5 [R-high]): NEG rotated copies of
the doc batch give each query 1 positive + NEG negatives; cosine similarities
are scaled by a hardcoded gamma=20 and softmax-normalized; loss is
-mean log P(positive). The build's primary mode scores the full [B_local,
B_global] similarity matrix instead (positives on the shard-offset diagonal) —
a strict superset (B_global - 1 negatives/query, BASELINE.json:8) with the
same per-pair math. The rotate mode is kept for step-for-step parity with the
numpy oracle (dssm_tpu/oracle/numpy_oracle.py).

Towers emit unit-norm embeddings, so cosine == dot and the whole loss is one
gamma-scaled matmul + log-softmax + gather — fused into a single Pallas kernel
on TPU (kernels/pallas_loss.py), with this XLA composition as fallback.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def in_batch_loss_xla(
    qh: jax.Array,
    dh: jax.Array,
    gamma: float,
    labels: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """qh [B, D] and dh [B', D] unit vectors. Positives at `labels` (default
    the diagonal). Returns (mean NLL, aux metrics)."""
    b = qh.shape[0]
    if labels is None:
        labels = jnp.arange(b)
    logits = gamma * jnp.dot(qh, dh.T, preferred_element_type=jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    pos = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    nll = logz - pos
    aux = {
        "loss": jnp.mean(nll),
        "in_batch_recall@1": jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        ),
        "pos_cos": jnp.mean(pos) / gamma,
    }
    return jnp.mean(nll), aux


def in_batch_loss(
    qh: jax.Array,
    dh: jax.Array,
    gamma: float,
    labels: Optional[jax.Array] = None,
    *,
    impl: str = "auto",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "xla":
        return in_batch_loss_xla(qh, dh, gamma, labels)
    if impl == "pallas":
        from dssm_tpu.kernels.pallas_loss import in_batch_loss_pallas

        return in_batch_loss_pallas(qh, dh, gamma, labels)
    raise ValueError(f"unknown impl {impl!r}")


def in_batch_loss_sharded(
    qh: jax.Array,
    dh: jax.Array,
    gamma: float,
    mesh,
    data_axis: str = "data",
    *,
    impl: str = "auto",
    global_pool: bool = True,
    reduce: str = "pmean",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Global-negative-pool loss as an EXPLICIT shard_map over `data_axis`.

    Each shard all-gathers the doc embeddings over the data axis (ICI) and
    runs the loss on its LOCAL query block x the GLOBAL doc pool — so the
    fused flash-style streaming-logsumexp kernel (kernels/pallas_loss.py) is
    what actually executes under SPMD (SURVEY.md §8 hard part 4), never
    materializing the [B_local, B_global] logits in HBM. Autodiff through the
    shard_map turns the all-gather's backward into the reduce-scatter
    transpose (SURVEY.md §8 hard part 1).

    qh, dh: [B_global, D] logical arrays (sharded or shardable P(data)).
    Returns (loss, aux) replicated scalars, numerically equal to
    in_batch_loss(qh, dh, gamma) when global_pool=True.

    global_pool=False scores each query against its LOCAL shard's docs only
    (B_local - 1 negatives) — the mesh.global_negatives=False configuration;
    cheaper, not parity with the single-device loss.

    reduce="pmean" (production): replicated scalar outputs via a trailing
    pmean. reduce="sum_shards": per-shard NLL/aux SUMS, out_specs
    P(data_axis), no trailing collective — the caller divides by B_global.
    Exists so CPU-mesh contract tests can run THIS function at pool sizes
    where XLA's in-process rendezvous would time out behind a minutes-long
    per-partition matmul (participants >40 s apart abort); also the right
    shape for loss-only diagnostics that want per-shard numbers.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if reduce not in ("pmean", "sum_shards"):
        raise ValueError(f"unknown reduce {reduce!r}")

    def local_fn(q, d):
        b_local = q.shape[0]
        if global_pool:
            pool = jax.lax.all_gather(d, data_axis, axis=0, tiled=True)
            offset = jax.lax.axis_index(data_axis) * b_local
        else:
            pool = d
            offset = 0
        labels = offset + jnp.arange(b_local, dtype=jnp.int32)
        loss, aux = in_batch_loss(q, pool, gamma, labels, impl=impl)
        if reduce == "sum_shards":
            return (loss[None] * b_local,
                    {k: v[None] * b_local for k, v in aux.items()})
        # Equal-sized shards: pmean of per-shard means == global mean.
        loss = jax.lax.pmean(loss, data_axis)
        aux = {k: jax.lax.pmean(v, data_axis) for k, v in aux.items()}
        return loss, aux

    out_spec = P(data_axis) if reduce == "sum_shards" else P()
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis, None)),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )(qh, dh)


def rotate_loss(
    qh: jax.Array,
    dh: jax.Array,
    offsets: jax.Array,
    gamma: float,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reference-parity FD_rotate loss (SURVEY.md §3.1 row 4).

    Candidates for query i: docs (i + r) % B for r in [0, *offsets]; softmax
    CE against candidate 0. Implemented as a column-gather of the full B x B
    cosine matrix — identical math to the reference's rotated concat, without
    materializing (NEG+1) copies of the doc batch.
    """
    b = qh.shape[0]
    sims = gamma * jnp.dot(qh, dh.T, preferred_element_type=jnp.float32)
    rs = jnp.concatenate([jnp.zeros((1,), dtype=offsets.dtype), offsets])
    rows = jnp.arange(b)[:, None]
    cand = (rows + rs[None, :]) % b  # [B, NEG+1]
    logits = jnp.take_along_axis(sims, cand, axis=1)
    logz = jax.nn.logsumexp(logits, axis=-1)
    nll = logz - logits[:, 0]
    aux = {
        "loss": jnp.mean(nll),
        "in_batch_recall@1": jnp.mean(
            (jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32)
        ),
        "pos_cos": jnp.mean(logits[:, 0]) / gamma,
    }
    return jnp.mean(nll), aux
