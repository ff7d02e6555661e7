"""Shape/dtype/invariant tests for all three tower families (SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.config import DataConfig, TowerConfig
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as model_base

V = 3000
B = 8


def _cfg(arch, **kw):
    defaults = dict(
        arch=arch, vocab_size=V, embed_width=32, hidden_dims=(24,),
        semantic_dim=16, conv_channels=24, lstm_hidden=24,
    )
    defaults.update(kw)
    return TowerConfig(**defaults)


def _batch(cfg):
    data = DataConfig(max_trigrams=32, max_words=6, max_trigrams_per_word=8)
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=5)
    hashed = loader.hash_pairs(pairs, cfg, data)
    return loader.select_batch(hashed, np.arange(B), cfg.is_sequence_model)


@pytest.mark.parametrize("arch", ["mlp", "cnn", "lstm"])
def test_embed_shape_and_unit_norm(arch):
    cfg = _cfg(arch)
    params = model_base.init_params(cfg, seed=0)
    batch = _batch(cfg)
    for side in ("q", "d"):
        y = model_base.embed(params, cfg, side, batch)
        assert y.shape == (B, cfg.semantic_dim)
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=1), np.ones(B), rtol=1e-5
        )


@pytest.mark.parametrize("arch", ["mlp", "cnn", "lstm"])
def test_grads_finite(arch):
    cfg = _cfg(arch)
    params = model_base.init_params(cfg, seed=0)
    batch = _batch(cfg)

    def loss(p):
        q = model_base.embed(p, cfg, "q", batch)
        d = model_base.embed(p, cfg, "d", batch)
        return -jnp.mean(jnp.sum(q * d, axis=1))

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # At least some gradient signal everywhere except possibly the embedding
    # rows of unused trigrams.
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0


@pytest.mark.parametrize("arch", ["cnn", "lstm"])
def test_padding_invariance(arch):
    """Extra padding words (mask 0, weight 0) must not change the embedding."""
    cfg = _cfg(arch)
    params = model_base.init_params(cfg, seed=0)
    batch = _batch(cfg)
    y1 = np.asarray(model_base.embed(params, cfg, "q", batch))

    pad_extra = 3
    batch2 = dict(batch)
    for key, pad_shape in [("q_idx", None), ("q_wgt", None)]:
        arr = batch[key]
        pad = np.zeros((B, pad_extra, arr.shape[2]), dtype=arr.dtype)
        batch2[key] = np.concatenate([arr, pad], axis=1)
    batch2["q_mask"] = np.concatenate(
        [batch["q_mask"], np.zeros((B, pad_extra), dtype=batch["q_mask"].dtype)],
        axis=1,
    )
    y2 = np.asarray(model_base.embed(params, cfg, "q", batch2))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


def test_separate_towers():
    cfg = _cfg("mlp", shared_weights=False)
    params = model_base.init_params(cfg, seed=0)
    assert "query" in params and "doc" in params
    batch = _batch(cfg)
    q = model_base.embed(params, cfg, "q", batch)
    d = model_base.embed(params, cfg, "d", batch)
    assert q.shape == d.shape == (B, cfg.semantic_dim)
    # Different weights -> same text still embeds differently per tower
    batch_same = dict(batch)
    batch_same["d_idx"], batch_same["d_wgt"] = batch["q_idx"], batch["q_wgt"]
    d_same = model_base.embed(params, cfg, "d", batch_same)
    assert not np.allclose(np.asarray(q), np.asarray(d_same))


def test_relu_activation():
    cfg = _cfg("mlp", activation="relu")
    params = model_base.init_params(cfg, seed=0)
    y = model_base.embed(params, cfg, "q", _batch(cfg))
    assert np.isfinite(np.asarray(y)).all()


def test_bfloat16_compute():
    cfg = _cfg("mlp", compute_dtype="bfloat16")
    params = model_base.init_params(cfg, seed=0)
    y = model_base.embed(params, cfg, "q", _batch(cfg))
    # Output normalized in f32 regardless of compute dtype
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=1), np.ones(B), rtol=1e-2
    )
