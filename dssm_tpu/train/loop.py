"""Single-device train step + loop.

Reference: a Python `for` loop calling `sess.run(train_step, feed_dict)` each
step (SURVEY.md §4.1) — per-step Python/feed_dict overhead is the chief thing
`jit` removes: here the towers, loss, backward, and optimizer update compile
to one XLA executable, one dispatch per step.

The multi-device path (pjit over a mesh, all-gather negative pool) lives in
dssm_tpu/parallel/; this module is the single-device core it builds on.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dssm_tpu.config import RunConfig
from dssm_tpu.loss.cosine_softmax import in_batch_loss, rotate_loss
from dssm_tpu.models import base as model_base
from dssm_tpu.oracle.numpy_oracle import rotation_offsets
from dssm_tpu.train.state import TrainState, make_optimizer


def make_loss_fn(cfg: RunConfig, impl: str) -> Callable:
    def loss_fn(params, batch):
        embed = functools.partial(
            model_base.embed, params, cfg.tower, impl=impl
        )
        if cfg.train.remat:
            embed = jax.checkpoint(embed)
        q = embed("q", batch)
        d = embed("d", batch)
        if cfg.loss.mode == "rotate":
            loss, aux = rotate_loss(q, d, batch["rot_offsets"], cfg.loss.gamma)
        else:
            loss, aux = in_batch_loss(q, d, cfg.loss.gamma, impl=impl)
        return loss, aux

    return loss_fn


def make_train_step(cfg: RunConfig, impl: Optional[str] = None) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics).

    SGD + sparse_embed_update (the default, reference-parity semantics) routes
    to the sparse-table-update step; otherwise the dense step below.
    """
    from dssm_tpu.train.sparse_update import make_sparse_train_step, uses_sparse_update

    if uses_sparse_update(cfg):
        return make_sparse_train_step(cfg, impl)
    return jax.jit(make_train_step_body(cfg, impl))


def make_train_step_body(cfg: RunConfig, impl: Optional[str] = None) -> Callable:
    """Un-jitted (state, batch) -> (state, aux): the scan-able step body."""
    from dssm_tpu.train.sparse_update import (
        make_sparse_train_step_body,
        uses_sparse_update,
    )

    if uses_sparse_update(cfg):
        return make_sparse_train_step_body(cfg, impl)
    if impl is None:
        impl = "auto" if cfg.train.use_pallas else "xla"
    tx = make_optimizer(cfg.train)
    loss_fn = make_loss_fn(cfg, impl)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, aux

    return train_step


def make_multi_train_step(cfg: RunConfig, impl: Optional[str] = None) -> Callable:
    """K steps per device dispatch: jitted (state, stacked_batches) ->
    (state, stacked_aux).

    `stacked_batches` is a batch dict whose every leaf has a leading [K] axis
    (see stack_batches); the step body runs K times sequentially inside ONE
    compiled executable via lax.scan — semantics identical to K single steps,
    but host dispatch overhead is paid once. aux leaves come back stacked [K].
    """
    body = make_train_step_body(cfg, impl)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches) -> Tuple[TrainState, Dict]:
        return jax.lax.scan(body, state, batches)

    return multi_step


def stack_batches(batches) -> Dict:
    """Stack K host batch dicts into one dict of [K, ...] arrays for
    make_multi_train_step. All batches must share keys (same loader config)."""
    batches = list(batches)
    keys = batches[0].keys()
    for b in batches[1:]:
        if b.keys() != keys:
            raise ValueError("cannot stack batches with differing keys")
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in keys}


def make_eval_step(cfg: RunConfig, impl: Optional[str] = None) -> Callable:
    if impl is None:
        impl = "auto" if cfg.train.use_pallas else "xla"
    loss_fn = make_loss_fn(cfg, impl)

    @jax.jit
    def eval_step(params, batch) -> Dict:
        _, aux = loss_fn(params, batch)
        return aux

    return eval_step


def add_rotation_offsets(batch: Dict, cfg: RunConfig, step: int) -> Dict:
    """Rotate-parity mode: attach deterministic per-step rotation offsets."""
    if cfg.loss.mode == "rotate":
        # Size from q_wgt: it survives compress_wire, which drops q_idx from
        # dedup batches (loader.compress_wire).
        b = batch["q_wgt"].shape[0]
        batch = dict(batch)
        batch["rot_offsets"] = np.asarray(
            rotation_offsets(b, cfg.loss.num_negatives, cfg.train.seed + step),
            dtype=np.int32,
        )
    return batch


def train(
    cfg: RunConfig,
    state: TrainState,
    batches: Iterator[Dict],
    num_steps: int,
    metrics_cb: Optional[Callable[[int, Dict], None]] = None,
) -> TrainState:
    """Simple single-device driver used by tests and the tiny CPU preset."""
    k = cfg.train.steps_per_call
    if k > 1:
        # K steps per dispatch; ragged tails reuse the same compiled multi_fn
        # (the stacked leading dim stays K — jit sees one shape) by scanning
        # a full K block only when K steps remain, else falling to singles.
        multi_fn = make_multi_train_step(cfg)
        single_fn = make_train_step(cfg)
        i = 0
        while i < num_steps:
            if num_steps - i >= k:
                stacked = stack_batches(
                    add_rotation_offsets(next(batches), cfg, i + j)
                    for j in range(k)
                )
                t0 = time.perf_counter()
                state, auxes = multi_fn(state, stacked)
                if metrics_cb is not None and (i % cfg.train.log_every < k):
                    aux = {key: float(v[-1]) for key, v in auxes.items()}
                    aux["step_ms"] = (time.perf_counter() - t0) * 1e3 / k
                    metrics_cb(i + k - 1, aux)
                i += k
            else:
                batch = add_rotation_offsets(next(batches), cfg, i)
                state, _ = single_fn(state, batch)
                i += 1
        return state
    step_fn = make_train_step(cfg)
    for i in range(num_steps):
        batch = add_rotation_offsets(next(batches), cfg, i)
        t0 = time.perf_counter()
        state, aux = step_fn(state, batch)
        if metrics_cb is not None and (i % cfg.train.log_every == 0):
            aux = {k: float(v) for k, v in aux.items()}
            aux["step_ms"] = (time.perf_counter() - t0) * 1e3
            metrics_cb(i, aux)
    return state
