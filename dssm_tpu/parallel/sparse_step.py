"""SPMD sparse-update train step: the multihost preset's real configuration.

Combines the three big design pieces under one jitted, mesh-aware step
(BASELINE.json:11 — sharded embedding table + global negative pool):

  - two-level dedup compact lookup (kernels/dedup_embed.py); under vocab
    sharding the compact gather is a shard_map local-gather + psum
  - DP towers with the all-gather global negative pool (XLA-derived from
    sharding annotations, as in parallel/train_step.py)
  - sparse table updates: the replicated compact gradient (XLA psums it over
    'data' automatically) is scatter-added shard-locally over 'model'
    (kernels/sharded_embed.scatter_add_groups_sharded), donated in place

Dense params stay replicated with optax; exact-SGD semantics match the
single-device sparse step (tests/test_parallel_sparse.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dssm_tpu.config import RunConfig
from dssm_tpu.kernels.dedup_embed import (
    expand_group_rows,
    gather_compact,
    lookup_from_compact,
)
from dssm_tpu.kernels.pallas_gather import (
    scatter_add_row_groups,
    scatter_sr_row_groups,
    sublane_group,
)
from dssm_tpu.kernels.sharded_embed import (
    scatter_add_groups_sharded,
    scatter_sr_groups_sharded,
    sharded_lookup_context,
)
from dssm_tpu.loss.cosine_softmax import (
    in_batch_loss,
    in_batch_loss_sharded,
    rotate_loss,
)
from dssm_tpu.models import base as model_base
from dssm_tpu.models.base import TABLE_KEY
from dssm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from dssm_tpu.train.sparse_update import _dense_subtree, table_update_vals
from dssm_tpu.train.state import TrainState, make_optimizer


def rows2_from_compact(compact: jax.Array, sel: jax.Array,
                       collective_dtype: str = "float32") -> jax.Array:
    """rows2 = compact[sel] — the u2-wide SEL-basis input of the sel_local
    shard_map (see `lookups` below). Shared by the bench's composed-step
    emulation so the measured numerics can't drift from the production
    path. The bf16 cast is the collective-wire dtype (mesh.collective_
    dtype): the replicated input's grad psum then rides a bf16 wire."""
    rows2 = jnp.take(compact, sel, axis=0)
    if collective_dtype == "bfloat16" and rows2.dtype == jnp.float32:
        rows2 = rows2.astype(jnp.bfloat16)
    return rows2


def make_parallel_sparse_train_step(
    cfg: RunConfig, mesh: Mesh, impl: Optional[str] = None
) -> Callable:
    """Requires dedup batches ({q,d}_uniq/_sel/_inv). Call under `mesh`."""
    return jax.jit(make_parallel_sparse_step_body(cfg, mesh, impl),
                   donate_argnums=(0,))


def make_parallel_sparse_step_body(
    cfg: RunConfig, mesh: Mesh, impl: Optional[str] = None
) -> Callable:
    """Un-jitted SPMD sparse step body; scan-able (parallel.train_step
    .make_parallel_multi_step)."""
    if impl is None:
        impl = "auto" if cfg.train.use_pallas else "xla"
    table_key = TABLE_KEY[cfg.tower.arch]
    tx = make_optimizer(cfg.train)
    lr = cfg.train.learning_rate
    compute_dtype = jnp.dtype(cfg.tower.compute_dtype)
    mp = cfg.mesh.model_parallel
    on_tpu = jax.devices()[0].platform == "tpu"
    use_pallas_scatter = impl in ("pallas", "auto") and on_tpu
    # Resolved impl for the shard_map'd sharded-gather branch (an explicit
    # "pallas" — e.g. interpret-mode CPU tests — is honored as given).
    base_impl = impl if impl != "auto" else ("pallas" if on_tpu else "xla")
    batch_sh = NamedSharding(mesh, P(DATA_AXIS, None))

    def tab(params, side):
        tower = "shared" if "shared" in params else (
            "query" if side == "q" else "doc")
        return params[tower][table_key]

    def lookups(cq, cd, batch):
        if "uniq" in batch:
            # Union dedupe (shared table): cq is the single compact; ONE
            # row-selection serves both towers, fused with both count
            # builds on TPU (dedup_embed.joint_lookup_from_compact).
            from dssm_tpu.kernels.dedup_embed import joint_lookup_from_compact

            if "sel_local" in batch:
                # Per-data-shard slot spaces (loader.reslot_local): each
                # shard selects/counts against its OWN (much narrower) slot
                # list — explicit shard_map so the count width is the LOCAL
                # cap, not the global unique-row count.
                #
                # The shard_map input is rows2 = compact[sel] (the u2-wide
                # SEL basis), not the compact itself: the replicated input's
                # gradient transposes to an implicit psum over 'data', and
                # in the sel basis that all-reduce is 2x (f32) to 4x (bf16
                # table) smaller than the group-padded compact basis — the
                # dominant exposed-comm term at large dp
                # (parallel/comm_model.py, VERDICT r5 item 5). The
                # expansion g_compact[sel] += g_rows2 is the take()
                # transpose, replicated, no comm. sel_local holds GLOBAL
                # SLOT ids (indices into sel). mesh.collective_dtype=
                # "bfloat16" additionally halves the psum wire; the lookup
                # consumes rows2 at compute_dtype anyway.
                from jax import shard_map

                rows2 = rows2_from_compact(cq, batch["sel"],
                                           cfg.mesh.collective_dtype)

                def local_fn(r2, s, qi, qw, di, dw):
                    return joint_lookup_from_compact(
                        r2, s[0], qi, qw, di, dw, compute_dtype,
                        impl=base_impl)

                lq, ld = shard_map(
                    local_fn,
                    mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None),
                              P(DATA_AXIS, None), P(DATA_AXIS, None),
                              P(DATA_AXIS, None)),
                    out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
                    check_vma=False,
                )(rows2, batch["sel_local"], batch["q_inv"], batch["q_wgt"],
                  batch["d_inv"], batch["d_wgt"])
            else:
                lq, ld = joint_lookup_from_compact(
                    cq, batch["sel"], batch["q_inv"], batch["q_wgt"],
                    batch["d_inv"], batch["d_wgt"], compute_dtype,
                    impl=impl)
        else:
            lq = lookup_from_compact(cq, batch["q_inv"], batch["q_wgt"],
                                     compute_dtype, batch.get("q_sel"),
                                     impl=impl)
            ld = lookup_from_compact(cd, batch["d_inv"], batch["d_wgt"],
                                     compute_dtype, batch.get("d_sel"),
                                     impl=impl)
        return lq.astype(compute_dtype), ld.astype(compute_dtype)

    def loss_from_compacts(dense_params, cq, cd, batch):
        lq, ld = lookups(cq, cd, batch)
        q = model_base.embed_from_lookup(dense_params, cfg.tower, "q", batch,
                                         lq, impl=impl)
        d = model_base.embed_from_lookup(dense_params, cfg.tower, "d", batch,
                                         ld, impl=impl)
        # Towers stay batch-sharded over 'data'.
        q = jax.lax.with_sharding_constraint(q, batch_sh)
        d = jax.lax.with_sharding_constraint(d, batch_sh)
        if cfg.loss.mode == "rotate":
            return rotate_loss(q, d, batch["rot_offsets"], cfg.loss.gamma)
        if mesh.shape[DATA_AXIS] > 1:
            # Explicit shard_map: all-gather the doc pool over 'data' and run
            # the fused flash-style loss kernel on local-queries x global-pool.
            return in_batch_loss_sharded(
                q, d, cfg.loss.gamma, mesh, DATA_AXIS, impl=impl,
                global_pool=cfg.mesh.global_negatives,
            )
        return in_batch_loss(q, d, cfg.loss.gamma, impl=impl)

    def gather_one(table, uniq, group):
        if mp > 1:
            with sharded_lookup_context(
                    mesh, MODEL_AXIS, DATA_AXIS, base_impl,
                    cfg.mesh.collective_dtype):
                return gather_compact(table, uniq, group, impl=impl)
        return gather_compact(table, uniq, group, impl=impl)

    def apply_table_update(table, uniq, vals, seed, group, scale=None):
        """One row-group scatter-update: SR-to-grid for int8, SR for bf16
        tables, add otherwise; shard-local over 'model' when the table is
        vocab-sharded (int8 is mp=1-only, enforced by config validate)."""
        if jnp.dtype(table.dtype) == jnp.int8:
            from dssm_tpu.kernels.dedup_embed import gather_scale_rows

            sc = gather_scale_rows(scale, uniq, group)
            if use_pallas_scatter:
                from dssm_tpu.kernels.pallas_gather import (
                    scatter_sr_int8_row_groups)

                vals_grid = jnp.where(
                    sc > 0,
                    vals.astype(jnp.float32) / jnp.maximum(sc, 1e-30), 0.0)
                return scatter_sr_int8_row_groups(table, uniq, vals_grid,
                                                  group, seed)
            from dssm_tpu.kernels.stochastic import sr_quant_rows_int8

            rows = expand_group_rows(uniq, group)
            old = jnp.take(table, rows, axis=0, mode="fill", fill_value=0)
            newq = sr_quant_rows_int8(old, sc, vals.astype(jnp.float32),
                                      seed)
            return table.at[rows].set(newq, mode="drop")
        sr = (jnp.dtype(table.dtype) == jnp.bfloat16
              and cfg.train.table_stochastic_round)
        if sr:
            vals = vals.astype(jnp.float32)
            if mp > 1:
                return scatter_sr_groups_sharded(
                    table, uniq, vals, mesh, group, seed,
                    use_pallas=use_pallas_scatter,
                )
            if use_pallas_scatter:
                return scatter_sr_row_groups(table, uniq, vals, group, seed)
            from dssm_tpu.kernels.stochastic import sr_add_rows

            rows = expand_group_rows(uniq, group)
            old = jnp.take(table, rows, axis=0, mode="fill", fill_value=0)
            return table.at[rows].set(sr_add_rows(old, vals, seed),
                                      mode="drop")
        vals = vals.astype(table.dtype)
        if mp > 1:
            return scatter_add_groups_sharded(
                table, uniq, vals, mesh, group,
                use_pallas=use_pallas_scatter,
            )
        if use_pallas_scatter:
            return scatter_add_row_groups(table, uniq, vals, group)
        rows = expand_group_rows(uniq, group)
        return table.at[rows].add(vals, mode="drop")

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        params = state.params
        dense = _dense_subtree(params, table_key)
        group = sublane_group(tab(params, "q").dtype)

        if "uniq" in batch:
            # Union dedupe (shared table): one gather, one scatter.
            if "shared" not in params:
                raise ValueError(
                    "joint-dedup batches (`uniq`) require shared_weights")
            table = params["shared"][table_key]
            scale = params["shared"].get(f"{table_key}_scale")
            c = gather_one(table, batch["uniq"], group)
            if scale is not None:
                from dssm_tpu.kernels.dedup_embed import dequant_compact

                c = dequant_compact(c, scale, batch["uniq"], group)

            def loss_joint(dense_params, c_, b):
                return loss_from_compacts(dense_params, c_, None, b)

            (loss, aux), (g_dense, g_c) = jax.value_and_grad(
                loss_joint, argnums=(0, 1), has_aux=True
            )(dense, c, batch)
            updates, new_opt = tx.update(g_dense, state.opt_state, dense)
            new_dense = optax.apply_updates(dense, updates)
            vals = table_update_vals(cfg, g_c, c)
            seed = jnp.asarray(state.step, jnp.int32) * 4
            table = apply_table_update(table, batch["uniq"], vals, seed,
                                       group, scale)
            tp = dict(new_dense["shared"])
            tp[table_key] = table
            if scale is not None:
                tp[f"{table_key}_scale"] = scale
            return TrainState(step=state.step + 1, params={"shared": tp},
                              opt_state=new_opt), aux

        cq = gather_one(tab(params, "q"), batch["q_uniq"], group)
        cd = gather_one(tab(params, "d"), batch["d_uniq"], group)
        (loss, aux), (g_dense, g_cq, g_cd) = jax.value_and_grad(
            loss_from_compacts, argnums=(0, 1, 2), has_aux=True
        )(dense, cq, cd, batch)

        updates, new_opt = tx.update(g_dense, state.opt_state, dense)
        new_dense = optax.apply_updates(dense, updates)

        new_params = {}
        scatter_ix = 0  # per-scatter SR seed offset within the step
        for tower in params:
            tp = dict(new_dense[tower])
            table = params[tower][table_key]
            sides = {"shared": ("q", "d"), "query": ("q",), "doc": ("d",)}[tower]
            for side in sides:
                g_c = g_cq if side == "q" else g_cd
                compact = cq if side == "q" else cd
                vals = table_update_vals(cfg, g_c, compact)
                seed = jnp.asarray(state.step, jnp.int32) * 4 + scatter_ix
                scatter_ix += 1
                table = apply_table_update(table, batch[f"{side}_uniq"],
                                           vals, seed, group)
            tp[table_key] = table
            new_params[tower] = tp
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), aux

    return step
