"""SPMD train step: DP over 'data', global negative pool, sharded embedding.

Design (SURVEY.md §4.4): the step is written on GLOBAL logical arrays and
compiled once under jit with sharding annotations; XLA's SPMD partitioner
derives every collective:

  - batch sharded P('data')  -> towers run data-parallel
  - q @ d.T over the global batch -> XLA all-gathers doc embeddings over
    'data' (ICI) so every chip scores its local queries against the GLOBAL
    negative pool (BASELINE.json:5); its backward is the reduce-scatter
    transpose (verified by test_parallel.py HLO check)
  - grads for replicated params -> psum over 'data'
  - vocab-sharded embedding tables -> shard_map local-gather + psum
    (kernels/sharded_embed.py), grads land on the owning shard only

The loss is a global mean, so N-chip loss == 1-chip loss at fixed global
batch (SURVEY.md §8 hard part 1) — tested to near-bit tolerance.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dssm_tpu.config import RunConfig
from dssm_tpu.kernels.sharded_embed import sharded_lookup_context
from dssm_tpu.loss.cosine_softmax import (
    in_batch_loss,
    in_batch_loss_sharded,
    rotate_loss,
)
from dssm_tpu.models import base as model_base
from dssm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding
from dssm_tpu.train.state import TrainState, make_optimizer

# First-layer trigram tables (one per model family) — the only params big
# enough to shard (SURVEY.md §3.3: tower matmuls are replicated).
VOCAB_TABLE_KEYS = frozenset({"W0", "Wc", "Win"})


def param_pspec(path: Tuple, leaf, model_parallel: int) -> P:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if model_parallel > 1 and names and names[-1] in VOCAB_TABLE_KEYS:
        return P(MODEL_AXIS, None)
    return P()


def shard_params(params, mesh: Mesh, model_parallel: int):
    """device_put each param with its NamedSharding; jit propagates from there."""

    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_pspec(path, leaf, model_parallel))
        )

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: Dict, mesh: Mesh, stacked: bool = False) -> Dict:
    """stacked=True: leaves carry a leading [K] scan axis (unsharded) in
    front of the batch dim — the multi-step path (make_parallel_multi_step)."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS)) if stacked else batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    # Per-data-shard slot lists ([dp, cap], loader.reslot_local): leading dim
    # IS the data axis.
    sel_local = NamedSharding(mesh, P(None, DATA_AXIS, None) if stacked
                              else P(DATA_AXIS, None))
    # rot_offsets ([NEG]) and the dedup unique-row lists ([U]) are not
    # batch-dim data — replicate them.
    def pick(k):
        if k == "sel_local":
            return sel_local
        return rep if (k in ("rot_offsets", "uniq", "sel")
                       or k.endswith("_uniq") or k.endswith("_sel")) else sh

    return {k: jax.device_put(v, pick(k)) for k, v in batch.items()}


def create_sharded_state(cfg: RunConfig, mesh: Mesh, params) -> TrainState:
    from dssm_tpu.models.base import TABLE_KEY
    from dssm_tpu.train.sparse_update import _dense_subtree, uses_sparse_update

    params = shard_params(params, mesh, cfg.mesh.model_parallel)
    tx = make_optimizer(cfg.train)
    sparse = uses_sparse_update(cfg) and cfg.data.dedup_lookup
    table_key = TABLE_KEY[cfg.tower.arch]

    @jax.jit
    def init(p):
        opt_tree = _dense_subtree(p, table_key) if sparse else p
        return TrainState(
            step=jnp.zeros((), dtype=jnp.int32), params=p,
            opt_state=tx.init(opt_tree),
        )

    with mesh:
        return init(params)


def make_parallel_train_step(
    cfg: RunConfig, mesh: Mesh, impl: Optional[str] = None
) -> Callable:
    """Returns step(state, global_batch) -> (state, metrics); call under mesh.

    `global_batch` is a dict of GLOBAL logical arrays (each host passes its
    process-local shard under jax.make_array_from_process_local_data in the
    multi-host driver; single-host tests pass full arrays sharded P('data')).

    With sparse updates + dedup lookups enabled (the defaults for SGD), this
    dispatches to the sparse SPMD step (parallel/sparse_step.py), which
    requires dedup batch fields.
    """
    from dssm_tpu.train.sparse_update import uses_sparse_update

    if uses_sparse_update(cfg) and cfg.data.dedup_lookup:
        from dssm_tpu.parallel.sparse_step import make_parallel_sparse_train_step

        sparse_step = make_parallel_sparse_train_step(cfg, mesh, impl)
        dense_step = _make_dense_parallel_step(cfg, mesh, impl)

        def dispatch(state, batch):
            # Batch structure is static per jit trace: dedup batches take the
            # sparse SPMD step, plain batches the dense one.
            if "q_uniq" in batch or "uniq" in batch:
                return sparse_step(state, batch)
            return dense_step(state, batch)

        return dispatch
    return _make_dense_parallel_step(cfg, mesh, impl)


def make_parallel_multi_step(
    cfg: RunConfig, mesh: Mesh, impl: Optional[str] = None
) -> Callable:
    """K SPMD steps per dispatch: jitted (state, stacked_batches) ->
    (state, stacked_aux) — the parallel analogue of
    train.loop.make_multi_train_step. Batch leaves carry a leading [K] axis
    (train.loop.stack_batches); shard them P(None, 'data', ...) — the scan
    axis is unsharded. Dispatches sparse vs dense by batch structure, like
    make_parallel_train_step."""
    from dssm_tpu.train.sparse_update import uses_sparse_update

    def jit_scan(body):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi(state, batches):
            return jax.lax.scan(body, state, batches)

        return multi

    dense_multi = jit_scan(_make_dense_parallel_step_body(cfg, mesh, impl))
    if uses_sparse_update(cfg) and cfg.data.dedup_lookup:
        from dssm_tpu.parallel.sparse_step import make_parallel_sparse_step_body

        sparse_multi = jit_scan(make_parallel_sparse_step_body(cfg, mesh, impl))

        def dispatch(state, batches):
            if "q_uniq" in batches or "uniq" in batches:
                return sparse_multi(state, batches)
            return dense_multi(state, batches)

        return dispatch
    return dense_multi


def _make_dense_parallel_step(
    cfg: RunConfig, mesh: Mesh, impl: Optional[str] = None
) -> Callable:
    return jax.jit(_make_dense_parallel_step_body(cfg, mesh, impl))


def _make_dense_parallel_step_body(
    cfg: RunConfig, mesh: Mesh, impl: Optional[str] = None
) -> Callable:
    if impl is None:
        impl = "auto" if cfg.train.use_pallas else "xla"
    tx = make_optimizer(cfg.train)
    sharded_tables = cfg.mesh.model_parallel > 1

    def loss_fn(params, batch):
        def run():
            embed = functools.partial(model_base.embed, params, cfg.tower,
                                      impl=impl)
            if cfg.train.remat:
                embed = jax.checkpoint(embed)
            q = embed("q", batch)
            d = embed("d", batch)
            # Keep tower outputs batch-sharded over 'data'.
            q = jax.lax.with_sharding_constraint(q, NamedSharding(mesh, P(DATA_AXIS, None)))
            d = jax.lax.with_sharding_constraint(d, NamedSharding(mesh, P(DATA_AXIS, None)))
            if cfg.loss.mode == "rotate":
                return rotate_loss(q, d, batch["rot_offsets"], cfg.loss.gamma)
            if mesh.shape[DATA_AXIS] > 1:
                # Explicit shard_map all-gather of the doc pool over 'data';
                # the fused flash-style loss kernel runs under SPMD on
                # local-queries x global-pool (SURVEY.md §8 hard part 4).
                return in_batch_loss_sharded(
                    q, d, cfg.loss.gamma, mesh, DATA_AXIS, impl=impl,
                    global_pool=cfg.mesh.global_negatives,
                )
            return in_batch_loss(q, d, cfg.loss.gamma, impl=impl)

        if sharded_tables:
            with sharded_lookup_context(mesh, MODEL_AXIS, DATA_AXIS, impl if impl != "auto" else "xla"):
                return run()
        return run()

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), aux

    return step


def make_parallel_eval_fn(cfg: RunConfig, mesh: Mesh,
                          impl: Optional[str] = None) -> Callable:
    """Forward-only embed of a (sharded) batch -> (q, d) unit vectors."""
    if impl is None:
        impl = "auto" if cfg.train.use_pallas else "xla"

    @jax.jit
    def fwd(params, batch):
        def run():
            q = model_base.embed(params, cfg.tower, "q", batch, impl=impl)
            d = model_base.embed(params, cfg.tower, "d", batch, impl=impl)
            return q, d

        if cfg.mesh.model_parallel > 1:
            with sharded_lookup_context(mesh, MODEL_AXIS, DATA_AXIS,
                                        impl if impl != "auto" else "xla"):
                return run()
        return run()

    return fwd
