"""Numeric sanitizers (SURVEY §6.2): jax_debug_nans + checkify over the
train step. JAX is functionally pure, so the classic data-race surface
doesn't exist on device; the numeric sanitizers are the practical
"did the step silently produce garbage" detectors, and these tests pin
that both hooks (a) stay silent on a healthy step and (b) fire at the
first poisoned op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from dssm_tpu.config import (
    DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as mb
from dssm_tpu.train.loop import make_train_step
from dssm_tpu.train.state import create_state

B = 32


def _cfg():
    return RunConfig(
        tower=TowerConfig(vocab_size=2048, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=1024,
                        max_unique_rows=256),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=B, learning_rate=0.1, use_pallas=False),
    )


def _state_and_batch(cfg):
    pairs = toy.make_toy_pairs(B, vocab_words=48, seed=7)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    batch = loader.select_batch(
        hashed, np.arange(B), False,
        dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows,
        dedup_joint=cfg.tower.shared_weights,
    )
    state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    return state, batch


def _poison_table(state):
    """NaN one embedding row that the batch is guaranteed to touch (row 0
    group — the toy vocab always hashes something into the low rows; if not,
    poisoning everything still proves the detector)."""
    params = jax.tree.map(lambda x: x, state.params)
    tower = params[next(iter(params))]
    key = mb.TABLE_KEY["mlp"]
    tower[key] = jnp.full_like(tower[key], jnp.nan)
    return state.replace(params=params)


def test_debug_nans_clean_step():
    """A healthy train step must not trip jax_debug_nans (i.e. the step
    contains no masked-by-construction NaN/Inf intermediates)."""
    cfg = _cfg()
    state, batch = _state_and_batch(cfg)
    step = make_train_step(cfg, impl="xla")
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        for _ in range(2):
            state, aux = step(state, batch)
        assert np.isfinite(float(aux["loss"]))
    finally:
        jax.config.update("jax_debug_nans", prev)


def test_debug_nans_fires_on_poisoned_table():
    cfg = _cfg()
    state, batch = _state_and_batch(cfg)
    step = make_train_step(cfg, impl="xla")
    state = _poison_table(state)
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        with pytest.raises(FloatingPointError):
            _, aux = step(state, batch)
            float(aux["loss"])  # force materialization
    finally:
        jax.config.update("jax_debug_nans", prev)


def test_checkify_clean_and_poisoned():
    """checkify float_checks over the jitted step: silent on a healthy step,
    reports NaN on a poisoned one — usable under jit on any backend (unlike
    debug_nans it keeps async dispatch, so it's the production-safe probe)."""
    cfg = _cfg()
    state, batch = _state_and_batch(cfg)
    step = make_train_step(cfg, impl="xla")

    checked = checkify.checkify(step, errors=checkify.float_checks)

    err, (new_state, aux) = checked(state, batch)
    err.throw()  # healthy: no error payload
    assert np.isfinite(float(aux["loss"]))

    # the step donates its input state — build a fresh one to poison
    fresh = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    err, _ = checked(_poison_table(fresh), batch)
    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        err.throw()


def test_cli_debug_nans_flag():
    """--io.debug_nans=true round-trips through the override parser."""
    from dssm_tpu.cli.train import coerce_overrides
    from dssm_tpu.config import get_preset, validate

    cfg = validate(coerce_overrides(get_preset("tiny"),
                                    {"io.debug_nans": "true"}))
    assert cfg.io.debug_nans is True
