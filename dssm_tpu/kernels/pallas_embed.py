"""Pallas TPU kernel: direct (non-dedup) embedding-bag lookup from HBM.

    out[r] = sum_k wgt[r, k] * table[idx[r, k]]

the first-layer sparse matmul when batches carry RAW per-example indices
(no dedup fields). The dedup compact-gather path (kernels/dedup_embed.py) is
the production fast path; this kernel serves ad-hoc/dense-optimizer paths and
eval on raw batches, replacing XLA's row-serial TPU gather (~0.1-1 us/row).

Mechanism: HBM row slices must be sublane-group aligned (8 rows f32 / 16
bf16), so for every lookup the kernel group-DMAs the ALIGNED GROUP containing
that row into VMEM (idx = gid*group + rem), then per output row builds a
weighted one-hot select vector [K*group] from `rem` (VPU compares) and takes
one [1, K*group] @ [K*group, H] matmul (MXU) — no serial row engine anywhere.
~group x raw-bandwidth overhead vs the dedup path; still ~10x faster than the
XLA gather at Full-DSSM shapes.

Backward (custom VJP): d_wgt reuses the same DMA pattern with a transposed
matmul in-kernel; d_table is the standard dense segment-sum scatter (XLA) —
identical to the XLA path's backward (the sparse-update training step never
differentiates through the table here; see train/sparse_update.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dssm_tpu.kernels.pallas_gather import sublane_group

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _row_tile(rows: int, k: int, group: int, h: int, itemsize: int) -> int:
    """Mosaic block sublane dims must be divisible by 8 or equal the full
    array dim — so the row tile is 8 (or the whole batch when it's smaller)."""

    def fits(tr: int) -> bool:
        return tr * k * group * h * itemsize <= _VMEM_BUDGET_BYTES

    if rows % 8 == 0 and fits(8):
        return 8
    if rows <= 8 and fits(rows):
        return rows
    return 0


def _start_gathers(tr, k, group, base, gid_ref, table_ref, stacked, sem):
    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(gid_ref[base + j] * group, group)],
            stacked.at[pl.ds(j * group, group)],
            sem,
        )

    for j in range(tr * k):
        dma(j).start()
    for j in range(tr * k):
        dma(j).wait()


def _hit_matrix(rem_row, k, kg, group):
    """[KG, K] one-hot: hit[j, k] = (j == k*group + rem[k]).

    Built by broadcast compares (no reshapes — Mosaic can't shape-cast
    across the lane dim); consumed by NT matmuls.
    """
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (kg, k), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kg, k), 1)
    return (j_iota == k_iota * group + rem_row).astype(jnp.float32)


def _fwd_kernel(tr, k, group, gid_ref, rem_ref, wgt_ref, table_ref, out_ref,
                stacked, sem):
    i = pl.program_id(0)
    _start_gathers(tr, k, group, i * tr * k, gid_ref, table_ref, stacked, sem)
    kg = k * group
    for r in range(tr):
        hit = _hit_matrix(rem_ref[pl.ds(r, 1), :], k, kg, group)
        sel = jax.lax.dot_general(  # [1, K] @ [KG, K]^T -> [1, KG]
            wgt_ref[pl.ds(r, 1), :], hit, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        block = stacked[pl.ds(r * kg, kg), :].astype(jnp.float32)
        out_ref[pl.ds(r, 1), :] = jnp.dot(
            sel, block, preferred_element_type=jnp.float32
        )


def _bwd_kernel(tr, k, group, gid_ref, rem_ref, g_ref, table_ref, dwgt_ref,
                stacked, sem):
    i = pl.program_id(0)
    _start_gathers(tr, k, group, i * tr * k, gid_ref, table_ref, stacked, sem)
    kg = k * group
    for r in range(tr):
        block = stacked[pl.ds(r * kg, kg), :].astype(jnp.float32)
        g_r = g_ref[pl.ds(r, 1), :].astype(jnp.float32)  # [1, H]
        dots = jax.lax.dot_general(  # dots[0, j] = g_r . stacked_r[j]
            g_r, block, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hit = _hit_matrix(rem_ref[pl.ds(r, 1), :], k, kg, group)
        dwgt_ref[pl.ds(r, 1), :] = jnp.dot(  # [1, KG] @ [KG, K] -> [1, K]
            dots, hit, preferred_element_type=jnp.float32
        )


def _pallas_args(table, tr, k, group, rows, out_h, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, k), lambda i, gid_ref: (i, 0),
                         memory_space=pltpu.VMEM),  # rem / rem
            pl.BlockSpec((tr, out_h[1]) if out_h[0] == "g" else (tr, k),
                         lambda i, gid_ref: (i, 0),
                         memory_space=pltpu.VMEM),  # wgt (fwd) / g (bwd)
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((tr, out_h[2]), lambda i, gid_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tr * k * group, table.shape[1]), table.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    cost = pl.CostEstimate(
        flops=2 * rows * k * group * table.shape[1],
        bytes_accessed=rows * k * group * table.shape[1] * table.dtype.itemsize,
        transcendentals=0,
    )
    return grid_spec, cost


def _fwd_call(table, gids, rem, wgt, interpret):
    rows, k = rem.shape
    group = sublane_group(table.dtype)
    h = table.shape[1]
    tr = _row_tile(rows, k, group, h, table.dtype.itemsize)
    grid_spec, cost = _pallas_args(table, tr, k, group, rows,
                                   ("w", k, h), interpret)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tr, k, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), jnp.float32),
        interpret=interpret,
        cost_estimate=cost,
    )(gids, rem, wgt, table)


def _bwd_call(table, gids, rem, g, k, interpret):
    rows = rem.shape[0]
    group = sublane_group(table.dtype)
    h = table.shape[1]
    tr = _row_tile(rows, k, group, h, table.dtype.itemsize)
    grid_spec, cost = _pallas_args(table, tr, k, group, rows,
                                   ("g", h, k), interpret)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tr, k, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, k), jnp.float32),
        interpret=interpret,
        cost_estimate=cost,
    )(gids, rem, g, table)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bag_op(table, idx2d, wgt2d, group, interpret):
    gids = (idx2d // group).reshape(-1)
    rem = idx2d % group
    return _fwd_call(table, gids, rem, wgt2d, interpret)


def _bag_fwd(table, idx2d, wgt2d, group, interpret):
    out = _bag_op(table, idx2d, wgt2d, group, interpret)
    return out, (table, idx2d, wgt2d)


def _bag_bwd(group, interpret, residuals, g):
    table, idx2d, wgt2d = residuals
    rows, k = idx2d.shape
    gids = (idx2d // group).reshape(-1)
    rem = idx2d % group
    d_wgt = _bwd_call(table, gids, rem, g.astype(jnp.float32), k, interpret)
    # d_table: dense scatter-add — identical to the XLA path's backward.
    contrib = (wgt2d[..., None] * g[:, None, :]).reshape(rows * k, -1)
    d_table = jax.ops.segment_sum(
        contrib.astype(jnp.float32), idx2d.reshape(-1),
        num_segments=table.shape[0],
    ).astype(table.dtype)
    return d_table, None, d_wgt.astype(wgt2d.dtype)


_bag_op.defvjp(_bag_fwd, _bag_bwd)


def embedding_bag_pallas(
    table: jax.Array,
    idx: jax.Array,
    wgt: jax.Array,
    *,
    interpret: bool = False,
) -> Optional[jax.Array]:
    """table [V, H], idx [..., K] int32, wgt [..., K] -> [..., H] f32.

    Returns None when shapes don't meet the kernel's constraints (caller
    falls back to embedding_bag_xla).
    """
    from dssm_tpu.kernels.pallas_gather import interpret_forced

    interpret = interpret or interpret_forced()
    group = sublane_group(table.dtype)
    v, h = table.shape
    k = idx.shape[-1]
    rows = 1
    for s in idx.shape[:-1]:
        rows *= s
    # HBM DMA slices must be lane-aligned on hardware: table width must be a
    # 128-multiple (model tables are lane-padded — models/base.py).
    if v % group or rows == 0 or (h % 128 and not interpret):
        return None
    if _row_tile(rows, k, group, h, table.dtype.itemsize) == 0:
        return None
    idx2d = idx.reshape(rows, k).astype(jnp.int32)
    wgt2d = wgt.reshape(rows, k).astype(jnp.float32)
    out = _bag_op(table, idx2d, wgt2d, group, interpret)
    return out.reshape(*idx.shape[:-1], h)
