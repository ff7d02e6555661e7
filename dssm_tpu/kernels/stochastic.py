"""Stochastic rounding f32 -> bf16 for low-precision embedding-table updates.

Why: with a bfloat16 table (tower.table_dtype="bfloat16", halving HBM
footprint and doubling gather/scatter DMA bandwidth), a typical SGD step on a
hot row is far below half a bf16 ulp of the weight — round-to-nearest would
erase it EVERY step and the table would never train. Stochastic rounding
rounds to the two neighboring bf16 values with probability proportional to
proximity, so E[round(x)] = x and the table follows the f32 trajectory in
expectation. This is the standard production recipe for low-precision
embedding tables (the reference keeps f32 tables and has no low-precision
story — SURVEY.md §3.1 row 3; this is a capability extension).

Two implementations with identical semantics (not bitwise — different PRNGs):
  - XLA bit-trick here (CPU/TPU fallback, used by tests and the non-Pallas
    paths): f32 bits + (rand & 0xFFFF), truncate to the top 16 bits.
  - Pallas kernel path: pltpu.prng_random_bits + pltpu.stochastic_round fused
    into the scatter RMW (kernels/pallas_gather.scatter_sr_row_groups).

The bit trick IS exact stochastic rounding: for a normal f32, the low 16 bits
are the fraction of the distance to the next-larger-magnitude bf16 value, and
adding uniform r < 2^16 carries into the top half with exactly that
probability (carry chains across exponent boundaries produce the correct next
representable; +-inf and NaN payloads survive truncation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def stochastic_round_bf16(x: jax.Array, bits: jax.Array) -> jax.Array:
    """Round f32 x to bf16 using uint32 random bits (same shape as x).

    Values exactly representable in bf16 round to themselves (their low 16
    bits are zero, so no carry is possible) — e.g. adding a zero update
    leaves a row bit-identical.
    """
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    b = b + (bits & np.uint32(0xFFFF))
    b = b & np.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(b, jnp.float32).astype(jnp.bfloat16)


def sr_bits(seed: jax.Array, shape) -> jax.Array:
    """uint32 random bits from an int32 scalar seed (threefry; jit-safe)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed.astype(jnp.int32))
    return jax.random.bits(key, shape, dtype=jnp.uint32)


def sr_add_rows(old_rows: jax.Array, vals: jax.Array,
                seed: jax.Array) -> jax.Array:
    """new_rows = stochastic_round_bf16(f32(old_rows) + f32(vals)).

    The XLA fallback body of the scatter-update: accumulate in f32, round
    once on the way back to storage precision.
    """
    acc = old_rows.astype(jnp.float32) + vals.astype(jnp.float32)
    return stochastic_round_bf16(acc, sr_bits(seed, acc.shape))


def stochastic_round_int8(x_over_scale: jax.Array, bits: jax.Array) -> jax.Array:
    """Round grid-relative values to int8 stochastically: floor(x + u),
    u ~ U[0, 1) from the uint32 bits — E[round(x)] = x on the grid; the
    result clips at the grid edge (the headroom margin makes clipping rare).
    Exact grid points round to themselves (u < 1 never carries)."""
    u = (bits >> np.uint32(8)).astype(jnp.float32) * np.float32(2.0 ** -24)
    q = jnp.floor(x_over_scale + u)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def sr_quant_rows_int8(old_q: jax.Array, scale_rows: jax.Array,
                       vals: jax.Array, seed: jax.Array) -> jax.Array:
    """int8 table row update: dequantize, accumulate in f32, stochastically
    round back to each row's int8 grid. Rows with scale 0 (never-initialized
    padding) stay exactly 0 regardless of vals."""
    sc = jnp.maximum(scale_rows.astype(jnp.float32), 1e-30)
    acc = old_q.astype(jnp.float32) + vals.astype(jnp.float32) / sc
    q = stochastic_round_int8(acc, sr_bits(seed, acc.shape))
    return jnp.where(scale_rows > 0, q, jnp.int8(0))
