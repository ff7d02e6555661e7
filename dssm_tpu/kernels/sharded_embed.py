"""Vocab-sharded embedding lookup: local partial gather + psum.

When the trigram table is sharded on the vocab axis over the 'model' mesh axis
(500k-vocab Full/Multi-host DSSM, BASELINE.json:11), a plain gather would make
XLA all-gather the whole table. Instead each shard gathers only the indices it
owns (out-of-range indices masked to weight 0) and the partial sums are
psum-reduced over 'model' — the "local partial gather + psum" design of
SURVEY.md §3.3. shard_map makes the communication explicit; autodiff through
it yields the masked local scatter-add for the table gradient with no dense
[B, V] intermediate (SURVEY.md §8 hard part 3).

The lookup runs inside the auto-sharded train step via a context: the
parallel train step installs (mesh, axis) and `embedding_bag` routes here
when the table is vocab-sharded, so model code never changes.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_CTX = threading.local()


@contextmanager
def sharded_lookup_context(mesh: Mesh, model_axis: str = "model",
                           data_axis: str = "data", base_impl: str = "xla",
                           collective_dtype: str = "float32"):
    prev = getattr(_CTX, "value", None)
    _CTX.value = (mesh, model_axis, data_axis, base_impl, collective_dtype)
    try:
        yield
    finally:
        _CTX.value = prev


def current_context() -> Optional[Tuple[Mesh, str, str, str, str]]:
    return getattr(_CTX, "value", None)


def scatter_add_groups_sharded(
    table: jax.Array,
    uniq_groups: jax.Array,
    vals: jax.Array,
    mesh: Mesh,
    group: int,
    model_axis: str = "model",
    use_pallas: bool = False,
) -> jax.Array:
    """Row-group scatter-add into a vocab-sharded table [V, H] P(model, None).

    Each 'model' shard adds the updates for groups it owns (others masked to
    zero). vals [G*group, H] and uniq_groups [G] are replicated. The sparse
    analogue of the dense grad psum: every shard sees the full (already
    psum-reduced) compact gradient and applies only its slice.
    """
    mp = mesh.shape[model_axis]
    v = table.shape[0]
    groups_per_shard = (v // mp) // group

    def local_fn(tbl, gids, lvals):
        shard = jax.lax.axis_index(model_axis)
        lo = shard * groups_per_shard
        rel = gids - lo
        owned = (rel >= 0) & (rel < groups_per_shard)
        # Not-owned groups (and dedupe sentinel padding) become the local
        # out-of-range sentinel: the Pallas kernel skips their DMA entirely,
        # the XLA fallback drops their writes.
        rel = jnp.where(owned, rel, groups_per_shard).astype(gids.dtype)
        g = gids.shape[0]
        masked = lvals.reshape(g, group, -1) * owned[:, None, None].astype(
            lvals.dtype
        )
        if use_pallas:
            from dssm_tpu.kernels.pallas_gather import scatter_add_row_groups

            return scatter_add_row_groups(
                tbl, rel, masked.reshape(g * group, -1), group
            )
        rows = (rel[:, None] * group
                + jnp.arange(group, dtype=rel.dtype)[None, :]).reshape(-1)
        return tbl.at[rows].add(masked.reshape(g * group, -1).astype(tbl.dtype),
                                mode="drop")

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(), P()),
        out_specs=P(model_axis, None),
        check_vma=False,
    )(table, uniq_groups, vals)


def scatter_sr_groups_sharded(
    table: jax.Array,
    uniq_groups: jax.Array,
    vals: jax.Array,
    mesh: Mesh,
    group: int,
    seed: jax.Array,
    model_axis: str = "model",
    use_pallas: bool = False,
) -> jax.Array:
    """Stochastic-rounding row-group SET into a vocab-sharded bf16 table.

    Sharded analogue of pallas_gather.scatter_sr_row_groups: each shard
    rewrites only its owned groups as stochastic_round(f32(rows) + vals).
    Not-owned groups are remapped to the out-of-range sentinel (local group
    count): the Pallas kernel skips their DMA entirely; the XLA fallback
    drops their writes (scatter mode='drop'). Unlike the add path, a clipped
    duplicate slot is NOT harmless under set semantics — it could overwrite
    the owner's write with stale rows — hence the sentinel, never clipping.
    """
    mp = mesh.shape[model_axis]
    v = table.shape[0]
    groups_per_shard = (v // mp) // group

    def local_fn(tbl, gids, lvals, lseed):
        shard = jax.lax.axis_index(model_axis)
        lo = shard * groups_per_shard
        rel = gids - lo
        owned = (rel >= 0) & (rel < groups_per_shard)
        rel = jnp.where(owned, rel, groups_per_shard).astype(gids.dtype)
        # Disjoint row ranges per shard; decorrelate streams anyway.
        seed_local = lseed * jnp.int32(mp) + shard.astype(jnp.int32)
        if use_pallas:
            from dssm_tpu.kernels.pallas_gather import scatter_sr_row_groups

            return scatter_sr_row_groups(tbl, rel, lvals, group, seed_local)
        from dssm_tpu.kernels.stochastic import sr_add_rows

        g = gids.shape[0]
        rows = (rel[:, None] * group
                + jnp.arange(group, dtype=rel.dtype)[None, :]).reshape(-1)
        old = jnp.take(tbl, rows, axis=0, mode="clip")
        new = sr_add_rows(old, lvals.reshape(g * group, -1), seed_local)
        return tbl.at[rows].set(new, mode="drop")

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(), P(), P()),
        out_specs=P(model_axis, None),
        check_vma=False,
    )(table, uniq_groups, vals, jnp.asarray(seed, jnp.int32))


def embedding_bag_sharded(
    table: jax.Array,
    idx: jax.Array,
    wgt: jax.Array,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    base_impl: str = "xla",
) -> jax.Array:
    """table [V, H] sharded P(model, None); idx/wgt [B, ...K] sharded P(data).

    Returns [B, ..., H] sharded P(data), replicated over model.
    """
    mp = mesh.shape[model_axis]
    v = table.shape[0]
    if v % mp != 0:
        raise ValueError(f"vocab {v} not divisible by model_parallel {mp}")
    rows_per_shard = v // mp

    batch_rank = idx.ndim  # [B, K] or [B, T, K]
    batch_spec = P(data_axis, *([None] * (batch_rank - 1)))
    out_spec = P(data_axis, *([None] * (batch_rank - 1)))

    def local_fn(tbl, lidx, lwgt):
        # Dispatch the base impl directly — going back through
        # embedding_bag() would re-enter the sharded-context routing.
        from dssm_tpu.kernels.sparse_embed import embedding_bag_xla

        if base_impl == "pallas":
            from dssm_tpu.kernels.pallas_embed import embedding_bag_pallas

            def bag(t, i, w):
                out = embedding_bag_pallas(t, i, w)
                return (out.astype(t.dtype) if out is not None
                        else embedding_bag_xla(t, i, w))
        else:
            bag = embedding_bag_xla
        shard = jax.lax.axis_index(model_axis)
        lo = shard * rows_per_shard
        rel = lidx - lo
        owned = (rel >= 0) & (rel < rows_per_shard)
        rel = jnp.clip(rel, 0, rows_per_shard - 1)
        partial = bag(tbl, rel, lwgt * owned.astype(lwgt.dtype))
        return jax.lax.psum(partial, model_axis)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(model_axis, None), batch_spec, batch_spec),
        out_specs=out_spec,
        check_vma=False,
    )(table, idx, wgt)
