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


def _fwd_kernel(k, compute_dtype, inv_ref, wgt_ref, compact_ref, out_ref):
    tr = inv_ref.shape[0]
    u2 = compact_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, u2), 1)
    cnt = jnp.zeros((tr, u2), dtype=jnp.float32)
    for i in range(k):  # K is small (<=64) and static: unrolled VPU compares
        hit = (inv_ref[:, i][:, None] == cols).astype(jnp.float32)
        cnt = cnt + wgt_ref[:, i][:, None] * hit
    out_ref[:] = jnp.dot(
        cnt.astype(compute_dtype), compact_ref[:],
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(k, compute_dtype, inv_ref, wgt_ref, g_ref, dc_ref, acc):
    """Grid over row tiles; accumulate d_compact2 += count_tile.T @ g_tile."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    tr = inv_ref.shape[0]
    u2 = acc.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, u2), 1)
    cnt = jnp.zeros((tr, u2), dtype=jnp.float32)
    for j in range(k):
        hit = (inv_ref[:, j][:, None] == cols).astype(jnp.float32)
        cnt = cnt + wgt_ref[:, j][:, None] * hit
    acc[:] = acc[:] + jnp.dot(
        cnt.T.astype(compute_dtype), g_ref[:].astype(compute_dtype),
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
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u2, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, h), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * u2 * (k + h),
            bytes_accessed=(rows * k * 8 + u2 * h * compact2.dtype.itemsize
                            + rows * h * 4),
            transcendentals=0,
        ),
    )(inv2d, wgt2d, compact2)


def _bwd_call(inv2d, wgt2d, g, u2, h, compute_dtype, interpret):
    rows, k = inv2d.shape
    tr = min(_ROW_TILE, rows)
    kernel = functools.partial(_bwd_kernel, k, compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u2, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((u2, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((u2, h), jnp.float32)],
        interpret=interpret,
    )(inv2d, wgt2d, g)


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
