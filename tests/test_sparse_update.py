"""Sparse row-wise table updates must be numerically equivalent to dense SGD
(reference parity: TF IndexedSlices semantics — train/sparse_update.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.config import DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as mb
from dssm_tpu.train.loop import make_train_step
from dssm_tpu.train.sparse_update import (
    make_sparse_train_step,
    scatter_table_update,
    uses_sparse_update,
)
from dssm_tpu.train.state import create_state

B = 32


def _cfg(arch="mlp", shared=True, optimizer="sgd"):
    return RunConfig(
        tower=TowerConfig(arch=arch, vocab_size=3000, embed_width=32,
                          hidden_dims=(24,), semantic_dim=16, conv_channels=24,
                          lstm_hidden=24, shared_weights=shared),
        data=DataConfig(max_trigrams=32, max_words=6, max_trigrams_per_word=8),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=B, learning_rate=0.1, optimizer=optimizer,
                          use_pallas=False),
    )


def _batch(cfg):
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=21)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    return loader.select_batch(hashed, np.arange(B), cfg.tower.is_sequence_model)


@pytest.mark.parametrize("arch", ["mlp", "cnn", "lstm"])
@pytest.mark.parametrize("shared", [True, False])
def test_sparse_step_matches_dense_step(arch, shared):
    cfg = _cfg(arch, shared)
    batch = _batch(cfg)
    dense_cfg = cfg.replace(train=cfg.train.replace(sparse_embed_update=False))

    s_dense = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    s_sparse = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    step_dense = make_train_step(dense_cfg, impl="xla")
    step_sparse = make_sparse_train_step(cfg, impl="xla")

    for i in range(3):
        s_dense, a_dense = step_dense(s_dense, batch)
        s_sparse, a_sparse = step_sparse(s_sparse, batch)
        assert abs(float(a_dense["loss"]) - float(a_sparse["loss"])) < 1e-5, i

    for tower in s_dense.params:
        for k in s_dense.params[tower]:
            np.testing.assert_allclose(
                np.asarray(s_dense.params[tower][k]),
                np.asarray(s_sparse.params[tower][k]),
                rtol=1e-4, atol=1e-6, err_msg=f"{tower}/{k}",
            )


def test_scatter_table_update_duplicates_and_padding():
    table = jnp.zeros((10, 4), dtype=jnp.float32)
    idx = np.array([[1, 1, 0], [2, 0, 0]], dtype=np.int32)  # dup row 1; padding 0s
    wgt = np.array([[1.0, 2.0, 0.0], [3.0, 0.0, 0.0]], dtype=np.float32)
    g = np.ones((2, 4), dtype=np.float32)
    out = np.asarray(scatter_table_update(table, jnp.asarray(idx),
                                          jnp.asarray(wgt), jnp.asarray(g), lr=0.1))
    np.testing.assert_allclose(out[1], -0.1 * 3.0 * np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(out[2], -0.1 * 3.0 * np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(out[0], np.zeros(4), atol=0)  # padding untouched
    assert (out[3:] == 0).all()


def test_dispatch_respects_optimizer():
    assert uses_sparse_update(_cfg(optimizer="sgd"))
    assert not uses_sparse_update(_cfg(optimizer="adam"))
    cfg = _cfg().replace(train=_cfg().train.replace(sparse_embed_update=False))
    assert not uses_sparse_update(cfg)
