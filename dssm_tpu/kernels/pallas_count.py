"""Pallas TPU kernel: fused count-matrix build + matmul for the dedup lookup.

The dedup lookup's on-device hot loop is

    count[r, u] = sum_k wgt[r, k] * (inv[r, k] == u)      (VPU compares)
    out = count @ compact2                                 (MXU)

XLA runs the count build as a 64-iteration while-loop with the [B, U2] count
round-tripping through HBM (~130 us/side at Full-DSSM shapes — the largest
single cost in the profiled train step). This kernel fuses both: count blocks
live only in VMEM/registers and feed the MXU directly. compact2 (the
row-selected compact table, U2 x H) fits VMEM whole.

Backward (custom VJP): d_compact2 = count.T @ g — a second kernel that
rebuilds count blocks transposed. inv/wgt are data (no gradients).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256


def _supported(rows: int, u2: int, h: int, k: int) -> bool:
    tr = min(_ROW_TILE, rows)
    return (
        rows % tr == 0 and tr % 8 == 0 and u2 % 128 == 0 and h % 128 == 0
    )


_K_CHUNK = 8  # predication granularity of the K unroll (see _tile_kmax)


def _tile_kmax(wgt2d: jax.Array, tr: int) -> jax.Array:
    """Per-row-tile bound on the K unroll: 1 + the last column with a
    nonzero weight, maxed over the tile. Entries at j >= bound contribute
    wgt=0 exactly (hash padding AND keep-dropped lookups), so chunks past
    it are skipped wholesale in the kernels. With the loader's
    sort-by-nnz row ordering (loader.sort_batch_rows), short rows cluster
    into tiles with small bounds and the count build stops scaling with
    the PADDED K (the largest compute stage: O(B x K x U2) VPU compares)."""
    rows, k = wgt2d.shape
    jidx = jnp.arange(k, dtype=jnp.int32)[None, :]
    last = jnp.max(jnp.where(wgt2d != 0, jidx, -1), axis=1) + 1  # [rows]
    return jnp.max(last.reshape(-1, tr), axis=1).astype(jnp.int32)


def _count_tile(kmax, k, inv_ref, wgt_ref, cnt_sc):
    """cnt_sc [TR, U2] = count matrix of this row tile, K-chunk predicated."""
    tr = inv_ref.shape[0]
    u2 = cnt_sc.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, u2), 1)
    cnt_sc[:] = jnp.zeros((tr, u2), dtype=jnp.float32)
    for c0 in range(0, k, _K_CHUNK):
        @pl.when(c0 < kmax)
        def _():
            cnt = cnt_sc[:]
            for j in range(c0, min(c0 + _K_CHUNK, k)):
                hit = (inv_ref[:, j][:, None] == cols).astype(jnp.float32)
                cnt = cnt + wgt_ref[:, j][:, None] * hit
            cnt_sc[:] = cnt


def _fwd_kernel(k, compute_dtype, kmax_ref, inv_ref, wgt_ref, compact_ref,
                out_ref, cnt_sc):
    i = pl.program_id(0)
    _count_tile(kmax_ref[i], k, inv_ref, wgt_ref, cnt_sc)
    out_ref[:] = jnp.dot(
        cnt_sc[:].astype(compute_dtype), compact_ref[:],
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(k, compute_dtype, kmax_ref, inv_ref, wgt_ref, g_ref, dc_ref,
                acc, cnt_sc):
    """Grid over row tiles; accumulate d_compact2 += count_tile.T @ g_tile."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    _count_tile(kmax_ref[i], k, inv_ref, wgt_ref, cnt_sc)
    acc[:] = acc[:] + jnp.dot(
        cnt_sc[:].T.astype(compute_dtype), g_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == ni - 1)
    def _():
        dc_ref[:] = acc[:]


def _fwd_call(compact2, inv2d, wgt2d, interpret):
    rows, k = inv2d.shape
    u2, h = compact2.shape
    tr = min(_ROW_TILE, rows)
    kernel = functools.partial(_fwd_kernel, k, compact2.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u2, h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, h), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tr, u2), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * u2 * (k + h),
            bytes_accessed=(rows * k * 8 + u2 * h * compact2.dtype.itemsize
                            + rows * h * 4),
            transcendentals=0,
        ),
    )(_tile_kmax(wgt2d, tr), inv2d, wgt2d, compact2)


def _bwd_call(inv2d, wgt2d, g, u2, h, compute_dtype, interpret):
    rows, k = inv2d.shape
    tr = min(_ROW_TILE, rows)
    kernel = functools.partial(_bwd_kernel, k, compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, h), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u2, h), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((u2, h), jnp.float32),
                        pltpu.VMEM((tr, u2), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((u2, h), jnp.float32),
        interpret=interpret,
    )(_tile_kmax(wgt2d, tr), inv2d, wgt2d, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _count_lookup_op(compact2, inv2d, wgt2d, interpret, u2, h, dtype_name):
    return _fwd_call(compact2, inv2d, wgt2d, interpret)


def _count_lookup_fwd(compact2, inv2d, wgt2d, interpret, u2, h, dtype_name):
    out = _fwd_call(compact2, inv2d, wgt2d, interpret)
    return out, (inv2d, wgt2d)


def _count_lookup_bwd(interpret, u2, h, dtype_name, residuals, g):
    inv2d, wgt2d = residuals
    cdtype = jnp.dtype(dtype_name)
    dc = _bwd_call(inv2d, wgt2d, g, u2, h, cdtype, interpret)
    return dc.astype(cdtype), None, None


_count_lookup_op.defvjp(_count_lookup_fwd, _count_lookup_bwd)


def count_lookup_pallas(
    compact2: jax.Array,
    inv: jax.Array,
    wgt: jax.Array,
    *,
    interpret: bool = False,
) -> Optional[jax.Array]:
    """out[..., :] = sum_k wgt[..., k] * compact2[inv[..., k]], fused.

    Returns None when shapes don't meet the kernel's tiling constraints
    (caller falls back to the XLA count_matrix path).
    """
    from dssm_tpu.kernels.pallas_gather import interpret_forced

    interpret = interpret or interpret_forced()
    k = inv.shape[-1]
    rows = 1
    for s in inv.shape[:-1]:
        rows *= s
    u2, h = compact2.shape
    if not _supported(rows, u2, h, k):
        return None
    inv2d = inv.reshape(rows, k).astype(jnp.int32)
    wgt2d = wgt.reshape(rows, k).astype(jnp.float32)
    out = _count_lookup_op(compact2, inv2d, wgt2d, interpret, u2, h,
                           jnp.dtype(compact2.dtype).name)
    return out.reshape(*inv.shape[:-1], h)
