"""Sparse-gradient embedding update: the row-wise table update.

Reference parity: TF1's `sparse_tensor_dense_matmul` backward yields
`tf.IndexedSlices`, and `GradientDescentOptimizer` applies them as row-wise
sparse updates — the reference NEVER materializes a dense [TRIGRAM_D, width]
gradient. A naive `jax.grad` over the whole param tree does (600 MB per tower
per step at Full-DSSM shapes, dominating step time ~5x). This module restores
the reference's sparse semantics, TPU-style:

  1. table lookups (gather + weighted sum) run OUTSIDE the differentiated
     function; their [B, H] outputs are the differentiation boundary
  2. jax.grad gives g_lookup [B, H] (tiny) plus dense-tower grads
  3. the table update is a scatter-add of rank-1 row contributions:
         table[idx[b,k]] -= lr * wgt[b,k] * g_lookup[b]
     touching only the ~B*K hit rows, with donated buffers so XLA updates
     the table in place.

Mathematically identical to dense SGD (scatter-add == dense-grad + SGD apply,
modulo float summation order); exact for SGD. momentum/adam keep dense state
and use the dense step (train/loop.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dssm_tpu.config import RunConfig
from dssm_tpu.loss.cosine_softmax import in_batch_loss, rotate_loss
from dssm_tpu.models import base as model_base
from dssm_tpu.models.base import TABLE_KEY
from dssm_tpu.train.state import TrainState, make_optimizer


def uses_sparse_update(cfg: RunConfig) -> bool:
    # Sparse table updates need a self-contained row update rule: plain SGD
    # (matching the dense optimizer) or row-wise AdaGrad (its accumulator
    # travels inside the table — see table_update_vals).
    return cfg.train.sparse_embed_update and (
        cfg.train.optimizer == "sgd" or cfg.train.table_optimizer == "adagrad"
    )


def logical_table_width(cfg: RunConfig) -> int:
    """Columns of the table that hold real weights (pre-lane-padding)."""
    tower = cfg.tower
    return {
        "mlp": tower.embed_width,
        "cnn": tower.conv_window * tower.conv_channels,
        "lstm": tower.embed_width,
    }[tower.arch]


def table_update_vals(cfg: RunConfig, g_compact: jax.Array,
                      compact: jax.Array) -> jax.Array:
    """Scatter-ADD values for one side's compact table rows.

    sgd:     vals = -lr * g                         (classic IndexedSlices)
    adagrad: row-wise AdaGrad. acc rides in the LAST (lane-padding) column of
             the table — gathered with the weights, updated by the same
             scatter: vals[:, :W] = -lr * g / sqrt(acc + g2 + eps),
             vals[:, ACC] = g2 where g2 = mean(g[:, :W]^2) per row.
             (With shared towers the two sides' g2 contributions add into acc
             sequentially; each side scales by acc_old + own g2.)
    """
    lr = cfg.train.learning_rate
    if cfg.train.table_optimizer == "sgd":
        return (-lr) * g_compact
    if cfg.train.table_optimizer != "adagrad":
        raise ValueError(cfg.train.table_optimizer)
    width = logical_table_width(cfg)
    h_pad = compact.shape[1]
    if h_pad <= width:
        raise ValueError(
            "adagrad table optimizer needs a spare lane-padding column; "
            f"table width {h_pad} == logical width {width}"
        )
    acc_col = h_pad - 1
    g32 = g_compact.astype(jnp.float32)
    g2 = jnp.mean(g32[:, :width] ** 2, axis=1, keepdims=True)  # [U, 1]
    acc_old = compact[:, acc_col:acc_col + 1].astype(jnp.float32)
    scale = lr / jnp.sqrt(acc_old + g2 + cfg.train.table_adagrad_eps)
    vals = -scale * g32
    # Column layout: [0, W) weights, (W, ACC) dead padding, ACC accumulator.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    vals = jnp.where(col_ids < width, vals, 0.0)
    vals = jnp.where(col_ids == acc_col, g2, vals)
    return vals


def _dense_subtree(params: Dict, table_key: str) -> Dict:
    # The table AND its int8 per-row scale (non-differentiable state) are
    # excluded from the densely-optimized subtree.
    drop = (table_key, f"{table_key}_scale")
    return {
        tower: {k: v for k, v in tp.items() if k not in drop}
        for tower, tp in params.items()
    }


def scatter_table_update(
    table: jax.Array,
    idx: jax.Array,
    wgt: jax.Array,
    g_lookup: jax.Array,
    lr: float,
) -> jax.Array:
    """table[idx[..., k]] -= lr * wgt[..., k] * g_lookup[...] via one scatter-add.

    idx/wgt: [..., K]; g_lookup: [..., H]. Padding entries carry weight 0 and
    scatter zero into row 0 — harmless by construction (trigram.PAD_INDEX).
    """
    h = g_lookup.shape[-1]
    vals = wgt[..., None].astype(jnp.float32) * g_lookup[..., None, :].astype(
        jnp.float32
    )  # [..., K, H]
    flat_vals = (-lr * vals).reshape(-1, h).astype(table.dtype)
    flat_idx = idx.reshape(-1)
    return table.at[flat_idx].add(flat_vals)


def make_sparse_train_step(cfg: RunConfig, impl: Optional[str] = None) -> Callable:
    """SGD train step with sparse table updates. Drop-in for make_train_step."""
    return jax.jit(make_sparse_train_step_body(cfg, impl), donate_argnums=(0,))


def make_sparse_train_step_body(
    cfg: RunConfig, impl: Optional[str] = None
) -> Callable:
    """Un-jitted (state, batch) -> (state, aux) body; scan-able for the
    K-steps-per-dispatch path (train/loop.make_multi_train_step)."""
    if impl is None:
        impl = "auto" if cfg.train.use_pallas else "xla"
    table_key = TABLE_KEY[cfg.tower.arch]
    tx = make_optimizer(cfg.train)
    lr = cfg.train.learning_rate

    def loss_from_lookups(dense_params, lq, ld, batch):
        if cfg.tower.shared_weights and cfg.tower.arch == "mlp":
            # Shared MLP towers: run BOTH sides through one stacked tower
            # call — one fused tower kernel on [2B] rows instead of two on
            # [B] (better MXU tiling, half the kernel launches fwd and bwd).
            # The MLP tower ignores batch/prefix, so stacking is exact.
            b = lq.shape[0]
            qd = model_base.embed_from_lookup(
                dense_params, cfg.tower, "q", batch,
                jnp.concatenate([lq, ld], axis=0), impl=impl)
            q, d = qd[:b], qd[b:]
        else:
            q = model_base.embed_from_lookup(dense_params, cfg.tower, "q",
                                             batch, lq, impl=impl)
            d = model_base.embed_from_lookup(dense_params, cfg.tower, "d",
                                             batch, ld, impl=impl)
        if cfg.loss.mode == "rotate":
            return rotate_loss(q, d, batch["rot_offsets"], cfg.loss.gamma)
        return in_batch_loss(q, d, cfg.loss.gamma, impl=impl)

    compute_dtype = jnp.dtype(cfg.tower.compute_dtype)

    def loss_from_compacts(dense_params, cq, cd, batch):
        from dssm_tpu.kernels.dedup_embed import lookup_from_compact

        lq = lookup_from_compact(cq, batch["q_inv"], batch["q_wgt"],
                                 compute_dtype, batch.get("q_sel"),
                                 impl=impl).astype(compute_dtype)
        ld = lookup_from_compact(cd, batch["d_inv"], batch["d_wgt"],
                                 compute_dtype, batch.get("d_sel"),
                                 impl=impl).astype(compute_dtype)
        return loss_from_lookups(dense_params, lq, ld, batch)

    def loss_from_compact_joint(dense_params, c, batch):
        # Shared table, union dedupe: ONE row-selection serves both towers;
        # autodiff gives the COMBINED compact gradient (dq-side + dd-side) in
        # a single array — one scatter updates the table for both. On TPU the
        # select + both count builds + both matmuls fuse into one kernel
        # (dedup_embed.joint_lookup_from_compact).
        from dssm_tpu.kernels.dedup_embed import joint_lookup_from_compact

        if "sel_local" in batch:
            # Host-local slot space (loader.reslot_local): sel_local holds
            # GLOBAL SLOT ids into `sel`; the single-device step consumes
            # exactly one shard, so compose row_sel = sel[sel_local[0]]
            # (identical selection to the SPMD rows2-basis path).
            sl = batch["sel_local"]
            if sl.ndim != 2 or sl.shape[0] != 1:
                raise ValueError(
                    f"sel_local shape {sl.shape}: the single-device step "
                    "needs local_sel_shards=1 (multi-shard slot spaces run "
                    "under the parallel step's shard_map)")
            row_sel = jnp.take(batch["sel"], sl[0], axis=0)
        else:
            row_sel = batch["sel"]
        lq, ld = joint_lookup_from_compact(
            c, row_sel, batch["q_inv"], batch["q_wgt"],
            batch["d_inv"], batch["d_wgt"], compute_dtype, impl=impl)
        return loss_from_lookups(dense_params, lq, ld, batch)

    def apply_table_update(table, uniq, vals, seed, scale=None):
        """One row-group scatter-update (SR-to-grid for int8, SR for bf16
        tables, add otherwise), Pallas on TPU with XLA fallback; sentinel
        slots skipped/dropped."""
        from dssm_tpu.kernels.dedup_embed import expand_group_rows
        from dssm_tpu.kernels.pallas_gather import (
            scatter_add_row_groups,
            scatter_sr_row_groups,
            sublane_group,
        )

        group = sublane_group(table.dtype)
        use_pallas = (impl in ("pallas", "auto")
                      and jax.devices()[0].platform == "tpu")
        if jnp.dtype(table.dtype) == jnp.int8:
            from dssm_tpu.kernels.dedup_embed import gather_scale_rows

            sc = gather_scale_rows(scale, uniq, group)
            if use_pallas:
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
        use_pallas_scatter = (
            impl in ("pallas", "auto")
            and jax.devices()[0].platform == "tpu"
        )
        sr = (jnp.dtype(table.dtype) == jnp.bfloat16
              and cfg.train.table_stochastic_round)
        if sr:
            vals = vals.astype(jnp.float32)
            if use_pallas_scatter:
                return scatter_sr_row_groups(table, uniq, vals, group, seed)
            from dssm_tpu.kernels.stochastic import sr_add_rows

            rows = expand_group_rows(uniq, group)
            old = jnp.take(table, rows, axis=0, mode="fill", fill_value=0)
            return table.at[rows].set(sr_add_rows(old, vals, seed),
                                      mode="drop")
        if use_pallas_scatter:
            return scatter_add_row_groups(table, uniq,
                                          vals.astype(table.dtype), group)
        rows = expand_group_rows(uniq, group)
        return table.at[rows].add(vals.astype(table.dtype), mode="drop")

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        from dssm_tpu.kernels.dedup_embed import gather_compact

        params = state.params
        dense = _dense_subtree(params, table_key)
        dedup = "q_uniq" in batch

        if "uniq" in batch:
            # Union dedupe (shared table): one gather, one scatter.
            if "shared" not in params:
                raise ValueError(
                    "joint-dedup batches (`uniq`) require shared_weights")
            from dssm_tpu.kernels.dedup_embed import dequant_compact
            from dssm_tpu.kernels.pallas_gather import sublane_group

            table = params["shared"][table_key]
            scale = params["shared"].get(f"{table_key}_scale")
            group = sublane_group(table.dtype)
            # NOTE: a fully fused gather+select+count kernel exists
            # (kernels/pallas_count.fused_gather_joint_lookup, parity
            # -tested) but measured consistently ~20 us SLOWER than this
            # two-kernel split on the chip (A/B 0.377/0.388 vs 0.407/0.395
            # ms/step): the serialized in-kernel per-slot DMA issue costs
            # more than the saved kernel launch + compact HBM round trip.
            # Keeping the split path.
            c = gather_compact(table, batch["uniq"], group, impl=impl)
            if scale is not None:
                c = dequant_compact(c, scale, batch["uniq"], group)
            (loss, aux), (g_dense, g_c) = jax.value_and_grad(
                loss_from_compact_joint, argnums=(0, 1), has_aux=True
            )(dense, c, batch)
            updates, new_opt = tx.update(g_dense, state.opt_state, dense)
            new_dense = optax.apply_updates(dense, updates)
            vals = table_update_vals(cfg, g_c, c)
            seed = jnp.asarray(state.step, jnp.int32) * 4
            table = apply_table_update(table, batch["uniq"], vals, seed,
                                       scale)
            tp = dict(new_dense["shared"])
            tp[table_key] = table
            if scale is not None:
                tp[f"{table_key}_scale"] = scale
            return TrainState(step=state.step + 1, params={"shared": tp},
                              opt_state=new_opt), aux

        if dedup:
            # Differentiate at the compact-row boundary: the table update is
            # then a U-row scatter (U = max_unique), not a B*K-row one.
            from dssm_tpu.kernels.dedup_embed import dequant_compact
            from dssm_tpu.kernels.pallas_gather import sublane_group

            def tab(side):
                tower = "shared" if "shared" in params else (
                    "query" if side == "q" else "doc")
                return params[tower]

            def gather_side(side):
                tp_side = tab(side)
                table = tp_side[table_key]
                group = sublane_group(table.dtype)
                c = gather_compact(table, batch[f"{side}_uniq"], group,
                                   impl=impl)
                scale = tp_side.get(f"{table_key}_scale")
                if scale is not None:
                    c = dequant_compact(c, scale, batch[f"{side}_uniq"],
                                        group)
                return c

            cq = gather_side("q")
            cd = gather_side("d")
            (loss, aux), (g_dense, g_cq, g_cd) = jax.value_and_grad(
                loss_from_compacts, argnums=(0, 1, 2), has_aux=True
            )(dense, cq, cd, batch)
        else:
            if cfg.train.table_optimizer == "adagrad":
                raise ValueError(
                    "table_optimizer='adagrad' requires dedup batches "
                    "(data.dedup_lookup)"
                )
            lq = model_base.embed_table_lookup(params, cfg.tower, "q", batch,
                                               impl=impl)
            ld = model_base.embed_table_lookup(params, cfg.tower, "d", batch,
                                               impl=impl)
            (loss, aux), (g_dense, g_lq, g_ld) = jax.value_and_grad(
                loss_from_lookups, argnums=(0, 1, 2), has_aux=True
            )(dense, lq, ld, batch)

        updates, new_opt = tx.update(g_dense, state.opt_state, dense)
        new_dense = optax.apply_updates(dense, updates)

        new_params = {}
        scatter_ix = 0  # per-scatter SR seed offset within the step
        for tower in params:
            tp = dict(new_dense[tower])
            table = params[tower][table_key]
            scale = params[tower].get(f"{table_key}_scale")
            sides = {"shared": ("q", "d"), "query": ("q",), "doc": ("d",)}[tower]
            for side in sides:
                if dedup:
                    g_c = g_cq if side == "q" else g_cd
                    compact = cq if side == "q" else cd
                    vals = table_update_vals(cfg, g_c, compact)
                    seed = (jnp.asarray(state.step, jnp.int32) * 4
                            + scatter_ix)
                    scatter_ix += 1
                    table = apply_table_update(table, batch[f"{side}_uniq"],
                                               vals, seed, scale)
                else:
                    g = g_lq if side == "q" else g_ld
                    table = scatter_table_update(
                        table, batch[f"{side}_idx"], batch[f"{side}_wgt"], g, lr
                    )
            tp[table_key] = table
            if scale is not None:
                tp[f"{table_key}_scale"] = scale
            new_params[tower] = tp
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), aux

    return step
