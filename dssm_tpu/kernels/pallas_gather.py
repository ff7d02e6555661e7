"""Pallas TPU kernels: compact row-group gather and scatter-add via async DMA.

XLA's TPU gather/scatter process rows through a serial row engine
(~0.1-1 us/row measured on v5e) — 10-100x off HBM bandwidth for embedding
row access. These kernels instead issue one aligned GROUP-DMA per unique
vocab row-group (group = sublane tile: 8 rows for f32, 16 for bf16 — Mosaic
requires HBM slices tile-aligned), many in flight per grid step, which the
DMA engines stream concurrently:

  gather_row_groups(table [V,H], gids [G]) -> [G*group, H]
  scatter_add_row_groups(table, gids [G], vals [G*group, H]) -> table
      (RMW: group DMA in, VPU add, group DMA out; table aliased in place)

Group ids arrive via PrefetchScalarGridSpec scalar prefetch so DMA source
addresses are known before the kernel body runs.

OUT-OF-RANGE group ids (gid >= V // group) are SKIPPED by every kernel: no
DMA is issued for that slot (gather zero-fills its output rows instead). The
dedup pipeline pads unused uniq_groups slots with dedup_embed.
SKIP_SENTINEL_GID, so only the rows a batch actually touches move — with
max_unique sized for headroom (~8x the typical unique count) the skip cuts
table DMA traffic by the same ~8x. The sharded paths reuse the sentinel for
not-owned groups.

scatter_add_row_groups REQUIRES distinct in-range group ids except entries
whose val rows are all zero — duplicate nonzero groups would race the
read-modify-write.
"""

from __future__ import annotations

import functools
from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUPS_PER_STEP = 64  # DMA-issue amortization; 128+ balloons Mosaic compile time, 256 exceeds sflag

# Test hook: force interpret mode for every kernel in this module (and the
# modules that consult it), so CPU tests can run the REAL kernel code paths —
# including under shard_map/pjit meshes — without a TPU.
_FORCE_INTERPRET = False


@contextmanager
def force_interpret():
    global _FORCE_INTERPRET
    prev = _FORCE_INTERPRET
    _FORCE_INTERPRET = True
    try:
        yield
    finally:
        _FORCE_INTERPRET = prev


def interpret_forced() -> bool:
    return _FORCE_INTERPRET


def sublane_group(dtype) -> int:
    """Minimum aligned row-group for DMA slicing of a [V, H] table."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize == 4:
        return 8
    if dtype.itemsize == 2:
        return 16
    if dtype.itemsize == 1:
        return 32
    raise ValueError(f"unsupported table dtype {dtype}")


def _step_flags(gids: jax.Array, num_groups: int, tg: int):
    """Per-grid-step summaries for the sentinel skip: all_valid[i] /
    none_valid[i] over each tg-slot block. Computed in XLA (two tiny
    reductions); lets the kernels take a wholesale fast path instead of
    2-4 scalar-unit branches per slot — the per-slot branching alone costs
    ~240 ns/slot and dominated gather/scatter time at padded slot caps
    (measured: 247 us gather with 99 real of 1024 slots)."""
    valid = (gids < num_groups).reshape(-1, tg)
    allv = jnp.all(valid, axis=1).astype(jnp.int32)
    nonev = jnp.logical_not(jnp.any(valid, axis=1)).astype(jnp.int32)
    return allv, nonev


def _gather_kernel(tg, group, num_groups, gid_ref, allv_ref, nonev_ref,
                   table_ref, out_ref, sems):
    i = pl.program_id(0)
    base = i * tg

    def dma(r):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            out_ref.at[pl.ds(r * group, group)],
            sems.at[r],
        )

    # Sentinel slots (gid >= num_groups) issue no DMA; their output rows are
    # zero-filled so downstream consumers (count matmuls, adagrad accumulator
    # reads) see exact zeros, never stale VMEM bits. Steps that are all-
    # sentinel (dedupe padding tail) or all-real skip the per-slot scalar
    # branching wholesale (_step_flags).
    @pl.when(nonev_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros((tg * group, out_ref.shape[1]), out_ref.dtype)

    @pl.when(allv_ref[i] == 1)
    def _():
        for r in range(tg):
            dma(r).start()
        for r in range(tg):
            dma(r).wait()

    @pl.when(jnp.logical_and(allv_ref[i] == 0, nonev_ref[i] == 0))
    def _():
        for r in range(tg):
            valid = gid_ref[base + r] < num_groups

            @pl.when(valid)
            def _():
                dma(r).start()

            @pl.when(jnp.logical_not(valid))
            def _():
                out_ref[pl.ds(r * group, group)] = jnp.zeros(
                    (group, out_ref.shape[1]), out_ref.dtype
                )
        for r in range(tg):
            @pl.when(gid_ref[base + r] < num_groups)
            def _():
                dma(r).wait()


def gather_row_groups(
    table: jax.Array,
    gids: jax.Array,
    group: int,
    *,
    interpret: bool = False,
    groups_per_step: int = _GROUPS_PER_STEP,
) -> jax.Array:
    """table [V, H], gids [G] int32 -> [G*group, H] (same dtype as table)."""
    g = gids.shape[0]
    v, h = table.shape
    if v % group:
        raise ValueError(f"vocab {v} not divisible by group {group}")
    tg = min(groups_per_step, g)
    if g % tg:
        raise ValueError(f"G={g} not divisible by groups_per_step={tg}")
    interpret = interpret or _FORCE_INTERPRET
    allv, nonev = _step_flags(gids, v // group, tg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g // tg,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tg * group, h), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tg,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, tg, group, v // group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g * group, h), table.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * g * group * h * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(gids, allv, nonev, table)


def _scatter_kernel(tg, group, num_groups, gid_ref, allv_ref, nonev_ref,
                    vals_ref, table_in_ref, table_out_ref, scratch, read_sems,
                    write_sems):
    i = pl.program_id(0)
    base = i * tg

    def rdma(r):
        return pltpu.make_async_copy(
            table_out_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            scratch.at[pl.ds(r * group, group)],
            read_sems.at[r],
        )

    def wdma(r):
        return pltpu.make_async_copy(
            scratch.at[pl.ds(r * group, group)],
            table_out_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            write_sems.at[r],
        )

    # Sentinel slots (gid >= num_groups: dedupe padding / not-owned shards)
    # are skipped entirely. Their stale scratch rows flow through the add but
    # are never written back — harmless. All-sentinel steps (dedupe padding
    # tail) do NOTHING; all-real steps run branch-free (_step_flags).
    @pl.when(allv_ref[i] == 1)
    def _():
        for r in range(tg):
            rdma(r).start()
        for r in range(tg):
            rdma(r).wait()
        scratch[:] = scratch[:] + vals_ref[:].astype(scratch.dtype)
        for r in range(tg):
            wdma(r).start()
        for r in range(tg):
            wdma(r).wait()

    @pl.when(jnp.logical_and(allv_ref[i] == 0, nonev_ref[i] == 0))
    def _():
        def when_valid(r, op):
            @pl.when(gid_ref[base + r] < num_groups)
            def _():
                op()

        for r in range(tg):
            when_valid(r, rdma(r).start)
        for r in range(tg):
            when_valid(r, rdma(r).wait)
        scratch[:] = scratch[:] + vals_ref[:].astype(scratch.dtype)
        for r in range(tg):
            when_valid(r, wdma(r).start)
        for r in range(tg):
            when_valid(r, wdma(r).wait)


def _scatter_sr_kernel(tg, group, num_groups, gid_ref, seed_ref, allv_ref,
                       nonev_ref, vals_ref, table_in_ref, table_out_ref,
                       scratch, read_sems, write_sems):
    i = pl.program_id(0)
    base = i * tg
    # Fold the grid step into the seed: every 32-group block draws an
    # independent stream; the caller varies seed_ref per train step and side.
    pltpu.prng_seed(seed_ref[0], i)

    def rdma(r):
        return pltpu.make_async_copy(
            table_out_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            scratch.at[pl.ds(r * group, group)],
            read_sems.at[r],
        )

    def wdma(r):
        return pltpu.make_async_copy(
            scratch.at[pl.ds(r * group, group)],
            table_out_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            write_sems.at[r],
        )

    def rmw(when_valid):
        for r in range(tg):
            when_valid(r, rdma(r).start)
        for r in range(tg):
            when_valid(r, rdma(r).wait)
        acc = scratch[:].astype(jnp.float32) + vals_ref[:].astype(jnp.float32)
        bits = pltpu.bitcast(pltpu.prng_random_bits(acc.shape), jnp.uint32)
        scratch[:] = pltpu.stochastic_round(acc, bits,
                                            target_dtype=scratch.dtype)
        for r in range(tg):
            when_valid(r, wdma(r).start)
        for r in range(tg):
            when_valid(r, wdma(r).wait)

    # Out-of-range gids (>= num_groups) are skipped entirely: the sharded
    # path marks not-owned groups with the sentinel num_groups so shards
    # never RMW rows they don't own (a clipped duplicate would race the
    # owner's set-write). Skipped slots leave stale scratch rows; computing
    # through them is harmless because their writes never happen.
    # All-sentinel steps do NOTHING; all-real steps run branch-free.
    @pl.when(allv_ref[i] == 1)
    def _():
        rmw(lambda r, op: op())

    @pl.when(jnp.logical_and(allv_ref[i] == 0, nonev_ref[i] == 0))
    def _():
        def when_valid(r, op):
            @pl.when(gid_ref[base + r] < num_groups)
            def _():
                op()

        rmw(when_valid)


def scatter_sr_row_groups(
    table: jax.Array,
    gids: jax.Array,
    vals: jax.Array,
    group: int,
    seed: jax.Array,
    *,
    interpret: bool = False,
    groups_per_step: int = _GROUPS_PER_STEP,
) -> jax.Array:
    """table[rows of gids] = stochastic_round(f32(table rows) + f32(vals)).

    The bf16-table update: the RMW scatter of scatter_add_row_groups with an
    f32 accumulate and a stochastically-rounded write-back fused in (see
    kernels/stochastic.py for why). SET semantics: gids must be fully
    distinct (the dedupe pads slots with an absent group id, so they are);
    a padding slot's vals are zero and its rounded write-back is bit-exact
    (zero low bits cannot carry), leaving those rows untouched.

    seed: int32 scalar (vary per step/side — the grid step is folded in
    internally). gids >= V // group are skipped (sharded-table sentinel).
    """
    g = gids.shape[0]
    v, h = table.shape
    if v % group:
        raise ValueError(f"vocab {v} not divisible by group {group}")
    if jnp.dtype(table.dtype) != jnp.bfloat16:
        raise ValueError(f"stochastic-round scatter needs a bf16 table, "
                         f"got {table.dtype}")
    tg = min(groups_per_step, g)
    if g % tg:
        raise ValueError(f"G={g} not divisible by groups_per_step={tg}")
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    interpret = interpret or _FORCE_INTERPRET
    allv, nonev = _step_flags(gids, v // group, tg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(g // tg,),
        in_specs=[
            pl.BlockSpec((tg * group, h), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # vals block (f32)
            pl.BlockSpec(memory_space=pl.ANY),  # table (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tg * group, h), table.dtype),
            pltpu.SemaphoreType.DMA((tg,)),
            pltpu.SemaphoreType.DMA((tg,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_sr_kernel, tg, group, v // group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, h), table.dtype),
        # operand 5 = table (gids, seed, allv, nonev, vals, table)
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=g * group * h,
            bytes_accessed=(2 * g * group * h * table.dtype.itemsize
                            + g * group * h * 4),
            transcendentals=0,
        ),
    )(gids, seed_arr, allv, nonev, vals, table)


def _scatter_sr_int8_kernel(tg, group, num_groups, gid_ref, seed_ref,
                            allv_ref, nonev_ref, vals_ref, table_in_ref,
                            table_out_ref, scratch, read_sems, write_sems):
    """int8-grid RMW scatter: new_q = clip(floor(old_q + vals + u)) with
    u ~ U[0,1) — unbiased stochastic rounding onto the row's int8 grid.
    `vals` arrive PRE-SCALED to grid units (vals_f32 / row_scale, zero for
    scale-0 rows), so the kernel needs no per-row scale input and mirrors
    the bf16 SR kernel exactly."""
    i = pl.program_id(0)
    base = i * tg
    pltpu.prng_seed(seed_ref[0], i)

    def rdma(r):
        return pltpu.make_async_copy(
            table_out_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            scratch.at[pl.ds(r * group, group)],
            read_sems.at[r],
        )

    def wdma(r):
        return pltpu.make_async_copy(
            scratch.at[pl.ds(r * group, group)],
            table_out_ref.at[pl.ds(gid_ref[base + r] * group, group)],
            write_sems.at[r],
        )

    def rmw(when_valid):
        for r in range(tg):
            when_valid(r, rdma(r).start)
        for r in range(tg):
            when_valid(r, rdma(r).wait)
        acc = scratch[:].astype(jnp.float32) + vals_ref[:]
        bits = pltpu.bitcast(pltpu.prng_random_bits(acc.shape), jnp.uint32)
        # Mosaic lacks uint32->f32; the >>8 top bits fit int32 exactly.
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
            2.0 ** -24)
        scratch[:] = jnp.clip(jnp.floor(acc + u), -127.0,
                              127.0).astype(jnp.int8)
        for r in range(tg):
            when_valid(r, wdma(r).start)
        for r in range(tg):
            when_valid(r, wdma(r).wait)

    @pl.when(allv_ref[i] == 1)
    def _():
        rmw(lambda r, op: op())

    @pl.when(jnp.logical_and(allv_ref[i] == 0, nonev_ref[i] == 0))
    def _():
        def when_valid(r, op):
            @pl.when(gid_ref[base + r] < num_groups)
            def _():
                op()

        rmw(when_valid)


def scatter_sr_int8_row_groups(
    table: jax.Array,
    gids: jax.Array,
    vals_grid: jax.Array,
    group: int,
    seed: jax.Array,
    *,
    interpret: bool = False,
    groups_per_step: int = _GROUPS_PER_STEP,
) -> jax.Array:
    """int8-table RMW scatter with stochastic rounding onto the grid.

    vals_grid: f32 [G*group, H] add-values ALREADY divided by each row's
    scale (zeroed where scale is 0); semantics match
    kernels/stochastic.sr_quant_rows_int8 (different PRNG stream). gids >=
    V // group are skipped (dedupe-padding sentinel).
    """
    g = gids.shape[0]
    v, h = table.shape
    if v % group:
        raise ValueError(f"vocab {v} not divisible by group {group}")
    if jnp.dtype(table.dtype) != jnp.int8:
        raise ValueError(f"int8 scatter needs an int8 table, got "
                         f"{table.dtype}")
    tg = min(groups_per_step, g)
    if g % tg:
        raise ValueError(f"G={g} not divisible by groups_per_step={tg}")
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    interpret = interpret or _FORCE_INTERPRET
    allv, nonev = _step_flags(gids, v // group, tg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(g // tg,),
        in_specs=[
            pl.BlockSpec((tg * group, h), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # vals block (f32, grid)
            pl.BlockSpec(memory_space=pl.ANY),  # table (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tg * group, h), table.dtype),
            pltpu.SemaphoreType.DMA((tg,)),
            pltpu.SemaphoreType.DMA((tg,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_sr_int8_kernel, tg, group, v // group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, h), table.dtype),
        # operand 5 = table (gids, seed, allv, nonev, vals, table)
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=g * group * h,
            bytes_accessed=(2 * g * group * h + g * group * h * 4),
            transcendentals=0,
        ),
    )(gids, seed_arr, allv, nonev, vals_grid, table)


def scatter_add_row_groups(
    table: jax.Array,
    gids: jax.Array,
    vals: jax.Array,
    group: int,
    *,
    interpret: bool = False,
    groups_per_step: int = _GROUPS_PER_STEP,
) -> jax.Array:
    """Returns table with vals added at each group's rows; buffer aliased.

    Group ids must be distinct wherever vals is nonzero (module docstring).
    """
    g = gids.shape[0]
    v, h = table.shape
    if v % group:
        raise ValueError(f"vocab {v} not divisible by group {group}")
    tg = min(groups_per_step, g)
    if g % tg:
        raise ValueError(f"G={g} not divisible by groups_per_step={tg}")
    interpret = interpret or _FORCE_INTERPRET
    allv, nonev = _step_flags(gids, v // group, tg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g // tg,),
        in_specs=[
            pl.BlockSpec((tg * group, h), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # vals block
            pl.BlockSpec(memory_space=pl.ANY),  # table (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tg * group, h), table.dtype),
            pltpu.SemaphoreType.DMA((tg,)),
            pltpu.SemaphoreType.DMA((tg,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, tg, group, v // group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, h), table.dtype),
        # operand 4 = table (gids, allv, nonev, vals, table)
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=g * group * h,
            bytes_accessed=3 * g * group * h * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(gids, allv, nonev, vals, table)
