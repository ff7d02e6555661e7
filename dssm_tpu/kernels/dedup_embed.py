"""Deduplicated embedding lookup: compact gather + count-matrix matmul.

The TPU-native answer to sparse embedding lookup (the "Pallas sparse-lookup +
matmul kernel" of BASELINE.json:5, stage 1: XLA formulation; the Pallas
variants plug in behind the same interface).

Motivation (measured on v5e, see SURVEY/BENCH notes): XLA's gather/scatter
process rows at ~0.02-1 us/row, so a [B*K]=65k-row gather costs ~1.5-5 ms and
a 65k-row scatter ~5-12 ms — 10-100x off HBM bandwidth. But a batch of short
texts hits only U << B*K DISTINCT trigram rows (~800 of 65536 slots on the
toy corpus). So:

  host:   uniq[U], inv[B, K] = dedupe(idx)          (numpy, per batch)
  device: compact = table[uniq]                     (U-row gather, small)
          count[b, u] = sum_k wgt[b,k] * (inv[b,k]==u)   (VPU compares)
          out = count @ compact                     (MXU matmul)
  bwd:    d_compact = count.T @ g                   (MXU matmul)
          table[uniq] += -lr * d_compact            (U-row scatter)

Everything after the tiny gather is dense MXU/VPU streaming — no
data-dependent memory access — which is exactly what the hardware wants.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Padding slots in uniq_groups carry this out-of-range group id. Every
# consumer skips it: the Pallas gather/scatter kernels predicate their DMAs
# on gid < V // group (so ~7/8 padding slots cost nothing instead of a full
# row-group DMA each), the XLA gather fallback fills with zeros, and XLA
# scatter fallbacks drop out-of-bounds rows. Chosen so sentinel * group + 7
# still fits int32 for any supported sublane group (<= 32); config validation
# guarantees real vocab group ids stay below it.
SKIP_SENTINEL_GID = np.int32(1 << 25)


def dedupe_indices(
    idx: np.ndarray, u_cap: int, group: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side batch dedupe, at ROW-GROUP granularity.

    TPU HBM arrays are tiled (8,128) for f32 / (16,128) for bf16, so DMA row
    slices must be `group`-aligned. Deduping vocab row-GROUPS (idx // group)
    keeps the compact gather/scatter tile-aligned; the within-group offset
    (idx % group) folds into the compact row index — the count-matrix column —
    at zero extra cost.

    idx: int32 [...]. Returns:
      uniq_groups [u_cap // group] int32 — GROUP ids; compact row j corresponds
          to vocab row uniq_groups[j // group]*group + j%group. Padding slots
          carry SKIP_SENTINEL_GID (out of range for any real vocab): the
          gather/scatter kernels skip their DMAs entirely — typically ~7/8 of
          the slots are padding headroom, so this is the difference between
          DMA-ing max_unique rows and DMA-ing only the rows the batch touches.
          Being out of range also keeps RMW scatters race-free (no padding
          slot can alias a real group's read-modify-write). Real slots are a
          sorted-strictly-increasing prefix.
      inv  same shape as idx, int32 in [0, u_cap) — compact row per lookup
      keep_mask same shape, f32 — 0 where a lookup's group was dropped
          (overflow: rarest groups dropped; caller zeroes those weights)
    """
    if u_cap % group:
        raise ValueError(f"u_cap {u_cap} not divisible by group {group}")
    g_cap = u_cap // group
    flat = idx.reshape(-1)
    gids = flat // group
    uniq_g, inv_g = np.unique(gids, return_inverse=True)
    n = uniq_g.shape[0]
    if n > g_cap:
        counts = np.bincount(inv_g, minlength=n)
        keep = np.argsort(-counts, kind="stable")[:g_cap]
        keep.sort()
        remap = np.full((n,), -1, dtype=np.int64)
        remap[keep] = np.arange(g_cap)
        new_inv_g = remap[inv_g]
        mask = (new_inv_g >= 0).astype(np.float32)
        new_inv_g = np.where(new_inv_g >= 0, new_inv_g, 0)
        uniq_out = uniq_g[keep].astype(np.int32)
        pad = np.zeros((0,), dtype=np.int32)
    else:
        mask = np.ones_like(flat, dtype=np.float32)
        new_inv_g = inv_g
        uniq_out = uniq_g.astype(np.int32)
        pad = np.full((g_cap - n,), SKIP_SENTINEL_GID, dtype=np.int32)
    inv = new_inv_g * group + (flat % group)
    return (
        np.concatenate([uniq_out, pad]),
        inv.reshape(idx.shape).astype(np.int32),
        mask.reshape(idx.shape),
    )


def dedupe_two_level(
    idx: np.ndarray, g_cap_rows: int, u2_cap: int, group: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Two-level host dedupe: DMA-aligned row GROUPS + exact unique ROWS.

    Level 1 (groups) keeps the compact gather/scatter tile-aligned; level 2
    shrinks the count-matrix width from g_cap_rows (~8x diluted: one used row
    per group for hash-random ids) down to the ACTUAL unique-row count, making
    the on-device count build ~8x cheaper. The row selection compact2 =
    compact[row_sel] is itself a one-hot-select matmul on device — no gather.

    Returns:
      uniq_groups [g_cap_rows // group] int32 — as dedupe_indices
      row_sel     [u2_cap] int32 — compact-row index of each unique vocab row
                  (padded with 0)
      inv2        same shape as idx, int32 in [0, u2_cap) — unique-row slot
                  per lookup
      keep_mask   same shape, f32 — 0 where a lookup overflowed either cap

    Routes through the C++ data-plane (native/dssm_native.cpp) when built —
    hash-map counting instead of numpy's O(n log n) full sorts, GIL released
    so the loader's prefetch thread overlaps device steps. Bit-exact with the
    numpy path below (tests/test_native.py).
    """
    from dssm_tpu.data import native as _native

    fast = _native.dedupe_two_level(idx, g_cap_rows, u2_cap, group)
    if fast is not None:
        return fast
    return dedupe_two_level_numpy(idx, g_cap_rows, u2_cap, group)


def dedupe_two_level_numpy(
    idx: np.ndarray, g_cap_rows: int, u2_cap: int, group: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pure-numpy reference for dedupe_two_level (the fallback when the C++
    extension isn't built, and the parity oracle for it)."""
    uniq_groups, inv, keep = dedupe_indices(idx, g_cap_rows, group)
    flat_inv = inv.reshape(-1)
    flat_keep = keep.reshape(-1)
    # Unique over kept compact-row ids only.
    kept_rows = flat_inv[flat_keep > 0]
    uniq_rows, _ = np.unique(kept_rows, return_inverse=True)
    n = uniq_rows.shape[0]
    if n > u2_cap:
        counts = np.bincount(
            np.searchsorted(uniq_rows, kept_rows), minlength=n
        )
        keep_idx = np.argsort(-counts, kind="stable")[:u2_cap]
        keep_idx.sort()
        uniq_rows = uniq_rows[keep_idx]
        n = u2_cap
    # Map every lookup's compact-row id to its slot (or drop).
    pos = np.searchsorted(uniq_rows, flat_inv)
    pos = np.clip(pos, 0, n - 1)
    hit = (uniq_rows[pos] == flat_inv) & (flat_keep > 0)
    inv2 = np.where(hit, pos, 0).astype(np.int32)
    keep2 = hit.astype(np.float32)
    row_sel = np.zeros((u2_cap,), dtype=np.int32)
    row_sel[:n] = uniq_rows
    return (
        uniq_groups,
        row_sel,
        inv2.reshape(idx.shape),
        keep2.reshape(idx.shape),
    )


def dedupe_two_level_joint(
    q_idx: np.ndarray, d_idx: np.ndarray, g_cap_rows: int, u2_cap: int,
    group: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray]:
    """UNION two-level dedupe over both sides' indices — for SHARED-table
    towers (the canonical DSSM configuration). One compact gather, one
    row-selection, and one scatter-update then serve BOTH towers, halving
    table DMA traffic vs per-side dedupe; the combined compact gradient also
    makes row-wise AdaGrad exact (one accumulator update from the total
    gradient instead of two sequential per-side approximations).

    Returns (uniq_groups [G], row_sel [u2], q_inv, d_inv, q_keep, d_keep).
    """
    from dssm_tpu.data import native as _native

    nq = q_idx.size
    fast = _native.dedupe_two_level_joint(q_idx, d_idx, g_cap_rows, u2_cap,
                                          group)
    if fast is not None:
        uniq_groups, row_sel, inv2, keep = fast
    else:
        both = np.concatenate([q_idx.reshape(-1), d_idx.reshape(-1)])
        uniq_groups, row_sel, inv2, keep = dedupe_two_level(
            both, g_cap_rows, u2_cap, group)
    return (
        uniq_groups,
        row_sel,
        inv2[:nq].reshape(q_idx.shape),
        inv2[nq:].reshape(d_idx.shape),
        keep[:nq].reshape(q_idx.shape),
        keep[nq:].reshape(d_idx.shape),
    )


def select_rows(
    compact: jax.Array, row_sel: jax.Array, compute_dtype=jnp.float32
) -> jax.Array:
    """compact2 [u2, H] = compact[row_sel] via a one-hot-select MATMUL (no
    row-serial gather). Differentiable in `compact` (linear). Split out of
    lookup_from_compact so the joint-dedupe path computes it ONCE for both
    towers."""
    gr, _ = compact.shape
    u2 = row_sel.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (u2, gr), 1)
    sel_oh = jax.lax.stop_gradient(
        (row_sel[:, None] == cols).astype(compute_dtype)
    )
    out = jnp.dot(sel_oh, compact.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    return out.astype(compute_dtype)


def count_matrix(
    inv: jax.Array, wgt: jax.Array, u: int, dtype=jnp.float32
) -> jax.Array:
    """count[row, u] = sum_k wgt[row, k] * (inv[row, k] == u).

    inv/wgt [..., K] -> count [prod(...), U]. Built as K one-hot
    accumulations — pure VPU compares, no scatter.
    """
    k = inv.shape[-1]
    inv2 = inv.reshape(-1, k)
    wgt2 = wgt.reshape(-1, k).astype(dtype)
    rows = inv2.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, u), 1)

    def body(i, acc):
        hit = (inv2[:, i][:, None] == cols).astype(dtype)
        return acc + wgt2[:, i][:, None] * hit

    return jax.lax.fori_loop(0, k, body, jnp.zeros((rows, u), dtype=dtype))


def lookup_from_compact(
    compact: jax.Array,
    inv: jax.Array,
    wgt: jax.Array,
    compute_dtype=jnp.float32,
    row_sel: Optional[jax.Array] = None,
    impl: str = "xla",
) -> jax.Array:
    """out[...] = sum_k wgt[..., k] * compact[inv[..., k]] via count @ compact.

    With row_sel (two-level dedupe): inv indexes the U2 unique-row slots and
    compact2 = compact[row_sel] is formed by a one-hot-select MATMUL (one
    compare per (slot, compact-row) — ~10x cheaper than widening the count
    matrix to the full group-diluted compact width).

    Differentiable in `compact` (linear — XLA autodiff emits the transposed
    matmuls). inv/wgt/row_sel are data.

    inv/wgt may arrive in the compressed wire format (int16 slots / uint8
    integral counts — data/loader.compress_wire, shipped to cut relay/PCIe
    bytes); they are widened here, a free VPU convert next to the matmul.
    """
    inv = inv.astype(jnp.int32)
    wgt = wgt.astype(compute_dtype)
    h = compact.shape[1]
    if row_sel is not None:
        compact2 = select_rows(compact, row_sel, compute_dtype)
        width = row_sel.shape[0]
    else:
        compact2 = compact.astype(compute_dtype)
        width = compact.shape[0]
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas":
        from dssm_tpu.kernels.pallas_count import count_lookup_pallas

        fused = count_lookup_pallas(compact2, inv, wgt)
        if fused is not None:
            return fused
    cnt = count_matrix(inv, wgt, width, dtype=compute_dtype)
    cnt = jax.lax.stop_gradient(cnt)
    out = jnp.dot(cnt, compact2, preferred_element_type=jnp.float32)
    return out.reshape(*inv.shape[:-1], h)


def joint_lookup_from_compact(
    compact: jax.Array,
    row_sel: jax.Array,
    q_inv: jax.Array,
    q_wgt: jax.Array,
    d_inv: jax.Array,
    d_wgt: jax.Array,
    compute_dtype=jnp.float32,
    impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """Union-dedupe lookup for BOTH towers from one compact block.

    impl="pallas" (TPU): ONE fused kernel does the row-select + both count
    builds + both matmuls with compact2 and the count tiles resident in VMEM
    (kernels/pallas_count.joint_lookup_pallas); its custom VJP runs both
    backward count rebuilds + the select transpose in one kernel too,
    yielding the COMBINED d_compact directly. Fallback: select_rows one-hot
    matmul + two lookup_from_compact calls — identical math.
    """
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas":
        from dssm_tpu.kernels.pallas_count import joint_lookup_pallas

        fused = joint_lookup_pallas(compact, row_sel, q_inv, q_wgt,
                                    d_inv, d_wgt)
        if fused is not None:
            qo, do = fused
            return qo.astype(compute_dtype), do.astype(compute_dtype)
    c2 = select_rows(compact, row_sel, compute_dtype)
    lq = lookup_from_compact(c2, q_inv, q_wgt, compute_dtype, None,
                             impl=impl)
    ld = lookup_from_compact(c2, d_inv, d_wgt, compute_dtype, None,
                             impl=impl)
    return lq.astype(compute_dtype), ld.astype(compute_dtype)


def expand_group_rows(uniq_groups: jax.Array, group: int) -> jax.Array:
    """GROUP ids [G] -> vocab row ids [G * group] (compact row order)."""
    g = uniq_groups.shape[0]
    offs = jnp.arange(group, dtype=uniq_groups.dtype)
    return (uniq_groups[:, None] * group + offs[None, :]).reshape(g * group)


def gather_compact(
    table: jax.Array, uniq_groups: jax.Array, group: int = 8,
    impl: str = "xla",
) -> jax.Array:
    """compact [G*group, H] = table rows of each unique group.

    Under a vocab-sharded context each 'model' shard gathers its owned rows
    (others masked to zero) and partial compacts are psum-reduced — the dedup
    analogue of sharded_embed.embedding_bag_sharded. impl="pallas" uses the
    DMA group-gather kernel (kernels/pallas_gather.py) on TPU.
    """
    from dssm_tpu.kernels import sharded_embed

    ctx = sharded_embed.current_context()
    if ctx is not None:
        mesh, model_axis, _, base_impl, coll_dtype = ctx
        if mesh.shape[model_axis] > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            mp = mesh.shape[model_axis]
            groups_per_shard = (table.shape[0] // mp) // group

            def local_fn(tbl, gids):
                # Each 'model' shard group-gathers only the groups it owns;
                # not-owned (and dedupe-padding) slots become the local
                # out-of-range sentinel, which the Pallas kernel skips (no
                # DMA) and the XLA fallback zero-fills — so the psum over
                # 'model' reconstructs the full compact block.
                shard = jax.lax.axis_index(model_axis)
                lo = shard * groups_per_shard
                rel = gids - lo
                owned = (rel >= 0) & (rel < groups_per_shard)
                rel = jnp.where(owned, rel, groups_per_shard).astype(
                    gids.dtype)
                if base_impl == "pallas":
                    from dssm_tpu.kernels.pallas_gather import (
                        gather_row_groups)

                    part = gather_row_groups(tbl, rel, group)
                else:
                    part = jnp.take(tbl, expand_group_rows(rel, group),
                                    axis=0, mode="fill", fill_value=0)
                if (coll_dtype == "bfloat16"
                        and part.dtype == jnp.float32):
                    # Halve the mp psum wire (mesh.collective_dtype): each
                    # row lives on exactly one shard, so the "sum" is a
                    # fill-in — bf16 rounds the row values once, exactly
                    # like the compute cast the lookup applies anyway.
                    return jax.lax.psum(
                        part.astype(jnp.bfloat16), model_axis
                    ).astype(jnp.float32)
                return jax.lax.psum(part, model_axis)

            return shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(P(model_axis, None), P()),
                out_specs=P(),
                check_vma=False,
            )(table, uniq_groups)
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas":
        from dssm_tpu.kernels.pallas_gather import gather_row_groups

        return gather_row_groups(table, uniq_groups, group)
    # Sentinel padding slots (gid >= V // group) become zero rows, matching
    # the Pallas kernel's skipped-slot semantics.
    return jnp.take(table, expand_group_rows(uniq_groups, group), axis=0,
                    mode="fill", fill_value=0)


def dequant_compact(compact: jax.Array, scale: jax.Array,
                    uniq_groups: jax.Array, group: int) -> jax.Array:
    """int8 compact rows -> f32 against the [V, 1] per-row scale param
    (sentinel/overflow rows take scale 0 -> exact zero rows)."""
    sc = gather_scale_rows(scale, uniq_groups, group)
    return compact.astype(jnp.float32) * sc


def gather_scale_rows(scale: jax.Array, uniq_groups: jax.Array,
                      group: int) -> jax.Array:
    """Per-row scales for the compact block, gathered at GROUP granularity:
    XLA's row-gather engine costs ~per-row, so fetching [G] group rows of a
    [V/group, group] view is ~group x cheaper than [G*group] single rows
    (measured ~0.2 ms at multihost caps). Returns [G*group, 1] f32."""
    v = scale.shape[0]
    sg = scale.reshape(v // group, group)
    sc = jnp.take(sg, uniq_groups, axis=0, mode="fill", fill_value=0)
    return sc.reshape(-1, 1)


def dedup_embedding_bag(
    table: jax.Array,
    uniq_groups: jax.Array,
    inv: jax.Array,
    wgt: jax.Array,
    compute_dtype=jnp.float32,
    group: int = 8,
    impl: str = "xla",
    row_sel: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Full fwd path: gather compact row-groups (dequantized for int8
    tables) then count-matmul."""
    compact = gather_compact(table, uniq_groups, group, impl=impl)
    if scale is not None:
        compact = dequant_compact(compact, scale, uniq_groups, group)
    return lookup_from_compact(compact, inv, wgt, compute_dtype, row_sel,
                               impl=impl)
