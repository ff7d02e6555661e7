"""TrainState and optimizer construction.

Reference: `tf.train.GradientDescentOptimizer(lr).minimize(loss)` and nothing
else (SURVEY.md §3.1 row 6 [R-high]). SGD is the parity default; momentum and
adam are options, all via optax so the update is part of the one compiled step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dssm_tpu.config import TrainConfig


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.learning_rate)
    if cfg.optimizer == "momentum":
        return optax.sgd(cfg.learning_rate, momentum=cfg.momentum)
    if cfg.optimizer == "adam":
        return optax.adam(cfg.learning_rate)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def create_state(params: Dict, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def create_run_state(cfg, params: Dict) -> TrainState:
    """RunConfig-aware state: under sparse table updates the optax state
    covers only the DENSE subtree (the table optimizer's state rides inside
    the table itself — train/sparse_update.table_update_vals), so e.g. adam
    never materializes [V, H] moments for the embedding table."""
    from dssm_tpu.models.base import TABLE_KEY
    from dssm_tpu.train.sparse_update import _dense_subtree, uses_sparse_update

    tx = make_optimizer(cfg.train)
    if uses_sparse_update(cfg):
        opt_init_tree = _dense_subtree(params, TABLE_KEY[cfg.tower.arch])
    else:
        opt_init_tree = params
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(opt_init_tree),
    )
