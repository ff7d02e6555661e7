"""Dedup compact-gather + count-matmul lookup (kernels/dedup_embed.py) must be
numerically identical to the plain gather+weighted-sum bag, in forward, in
gradients, and through whole training steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.config import DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig
from dssm_tpu.data import loader, toy
from dssm_tpu.kernels.dedup_embed import (
    count_matrix,
    dedup_embedding_bag,
    dedupe_indices,
    lookup_from_compact,
)
from dssm_tpu.kernels.sparse_embed import embedding_bag_xla
from dssm_tpu.models import base as mb
from dssm_tpu.train.loop import make_train_step
from dssm_tpu.train.state import create_state

B = 32


def test_dedupe_indices_roundtrip():
    idx = np.array([[5, 9, 5, 0], [9, 2, 0, 0]], dtype=np.int32)
    uniq, inv, keep = dedupe_indices(idx, u_cap=16, group=8)
    assert uniq.shape == (2,)  # group ids, u_cap // group
    assert (keep == 1.0).all()
    # group-expanded reconstruction: uniq[inv // g] * g + inv % g == idx
    np.testing.assert_array_equal(uniq[inv // 8] * 8 + inv % 8, idx)


def test_dedupe_overflow_drops_rarest():
    # group=2: groups are {0:(0,1), 1:(2,3), 2:(4,5), 8:(16,17)}
    idx = np.array([1, 1, 1, 2, 2, 4, 16, 17], dtype=np.int32)
    uniq, inv, keep = dedupe_indices(idx, u_cap=4, group=2)
    assert uniq.shape == (2,)
    kept = set(uniq.tolist())
    assert 0 in kept  # group 0 has 3 hits, most frequent
    assert keep.sum() == 5.0  # top-2 groups cover 5 of 8 lookups
    recon = uniq[inv // 2] * 2 + inv % 2
    np.testing.assert_array_equal(recon[keep == 1.0], idx[keep == 1.0])


def test_count_matrix_golden():
    inv = jnp.asarray([[0, 2, 2, 1]], dtype=jnp.int32)
    wgt = jnp.asarray([[1.0, 2.0, 0.5, 0.0]], dtype=jnp.float32)
    cnt = np.asarray(count_matrix(inv, wgt, 4))
    np.testing.assert_allclose(cnt, [[1.0, 0.0, 2.5, 0.0]])


@pytest.mark.parametrize("shape", [(8, 5), (4, 3, 5)])
def test_dedup_bag_matches_plain_bag(shape):
    rng = np.random.default_rng(0)
    v, h = 200, 16
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    idx = rng.integers(0, v, size=shape).astype(np.int32)
    wgt = rng.uniform(0, 2, size=shape).astype(np.float32)
    uniq, inv, keep = dedupe_indices(idx, u_cap=200, group=8)
    assert (keep == 1.0).all()

    ref = embedding_bag_xla(table, jnp.asarray(idx), jnp.asarray(wgt))
    out = dedup_embedding_bag(table, jnp.asarray(uniq), jnp.asarray(inv),
                              jnp.asarray(wgt), group=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_dedup_bag_grads_match():
    rng = np.random.default_rng(1)
    v, h = 104, 8
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    idx = rng.integers(0, v, size=(6, 4)).astype(np.int32)
    wgt = jnp.asarray(rng.uniform(0, 2, size=(6, 4)).astype(np.float32))
    uniq, inv, _ = dedupe_indices(idx, u_cap=96, group=8)

    g_ref = jax.grad(
        lambda t: (embedding_bag_xla(t, jnp.asarray(idx), wgt) ** 2).sum()
    )(table)
    g_dd = jax.grad(
        lambda t: (dedup_embedding_bag(t, jnp.asarray(uniq), jnp.asarray(inv),
                                       wgt, group=8) ** 2).sum()
    )(table)
    np.testing.assert_allclose(np.asarray(g_dd), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)


def _cfg(arch="mlp"):
    return RunConfig(
        tower=TowerConfig(arch=arch, vocab_size=3000, embed_width=32,
                          hidden_dims=(24,), semantic_dim=16, conv_channels=24,
                          lstm_hidden=24),
        data=DataConfig(max_trigrams=32, max_words=6, max_trigrams_per_word=8,
                        max_unique=4096),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=B, learning_rate=0.1, use_pallas=False),
    )


@pytest.mark.parametrize("arch", ["mlp", "cnn", "lstm"])
def test_dedup_train_step_matches_plain(arch):
    """Whole sparse-update train steps: dedup batch vs plain batch."""
    cfg = _cfg(arch)
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=33)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    seq = cfg.tower.is_sequence_model
    plain = loader.select_batch(hashed, np.arange(B), seq)
    dedup = loader.select_batch(hashed, np.arange(B), seq,
                                dedup_unique=cfg.data.max_unique)
    assert "q_uniq" in dedup and "q_uniq" not in plain

    step = make_train_step(cfg, impl="xla")
    s1 = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    s2 = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    for i in range(3):
        s1, a1 = step(s1, plain)
        s2, a2 = step(s2, dedup)
        assert abs(float(a1["loss"]) - float(a2["loss"])) < 1e-5, i
    for tower in s1.params:
        for k in s1.params[tower]:
            np.testing.assert_allclose(
                np.asarray(s1.params[tower][k]), np.asarray(s2.params[tower][k]),
                rtol=1e-4, atol=1e-6, err_msg=f"{tower}/{k}",
            )


def test_dedupe_two_level_roundtrip():
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level

    idx = np.array([[5, 9, 5, 0], [9, 2, 0, 0]], dtype=np.int32)
    uniq_g, row_sel, inv2, keep = dedupe_two_level(idx, 16, 8, group=8)
    assert (keep == 1.0).all()
    # compact row = row_sel[inv2]; vocab row = uniq_g[row // 8] * 8 + row % 8
    rows = row_sel[inv2]
    np.testing.assert_array_equal(uniq_g[rows // 8] * 8 + rows % 8, idx)


def test_dedupe_two_level_row_overflow():
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level

    idx = np.array([1, 1, 1, 2, 2, 3, 4, 5], dtype=np.int32)  # 5 unique rows
    uniq_g, row_sel, inv2, keep = dedupe_two_level(idx, 8, 3, group=8)
    assert keep.sum() == 6.0  # rows 1,2 (freq 3+2) + one more survive
    rows = row_sel[inv2[keep == 1.0]]
    recon = uniq_g[rows // 8] * 8 + rows % 8
    np.testing.assert_array_equal(recon, idx[keep == 1.0])


def test_dedupe_joint_roundtrip():
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level_joint

    q = np.array([[5, 9, 5, 0], [9, 2, 0, 0]], dtype=np.int32)
    d = np.array([[7, 9, 0, 3], [2, 2, 1, 0]], dtype=np.int32)
    uniq, sel, q_inv, d_inv, q_keep, d_keep = dedupe_two_level_joint(
        q, d, 16, 8, group=8)
    assert (q_keep == 1.0).all() and (d_keep == 1.0).all()
    rows_q = sel[q_inv]
    rows_d = sel[d_inv]
    np.testing.assert_array_equal(uniq[rows_q // 8] * 8 + rows_q % 8, q)
    np.testing.assert_array_equal(uniq[rows_d // 8] * 8 + rows_d % 8, d)


@pytest.mark.parametrize("arch", ["mlp"])
def test_joint_dedup_train_step_matches_plain(arch):
    """Union-dedupe (shared table: one gather + one scatter for both towers)
    must match plain-batch training step-for-step."""
    cfg = _cfg(arch)
    assert cfg.tower.shared_weights
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=33)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    plain = loader.select_batch(hashed, np.arange(B), False)
    joint = loader.select_batch(hashed, np.arange(B), False,
                                dedup_unique=cfg.data.max_unique,
                                dedup_joint=True)
    assert "uniq" in joint and "sel" in joint and "q_uniq" not in joint

    step = make_train_step(cfg, impl="xla")
    s1 = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    s2 = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    for i in range(3):
        s1, a1 = step(s1, plain)
        s2, a2 = step(s2, joint)
        assert abs(float(a1["loss"]) - float(a2["loss"])) < 1e-5, i
    for tower in s1.params:
        for k in s1.params[tower]:
            np.testing.assert_allclose(
                np.asarray(s1.params[tower][k]), np.asarray(s2.params[tower][k]),
                rtol=1e-4, atol=1e-6, err_msg=f"{tower}/{k}",
            )


def test_joint_dedup_adagrad_runs():
    """Joint path + row-wise AdaGrad: the accumulator update comes from the
    combined q+d gradient (exact, vs the per-side sequential approximation)."""
    cfg = _cfg("mlp")
    cfg = cfg.replace(train=cfg.train.replace(table_optimizer="adagrad"))
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=35)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    joint = loader.select_batch(hashed, np.arange(B), False,
                                dedup_unique=cfg.data.max_unique,
                                dedup_joint=True)
    step = make_train_step(cfg, impl="xla")
    s = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    losses = []
    for _ in range(5):
        s, a = step(s, joint)
        losses.append(float(a["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_two_level_lookup_matches_plain_bag():
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level, gather_compact

    rng = np.random.default_rng(7)
    v, h = 200, 16
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    idx = rng.integers(0, v, size=(8, 5)).astype(np.int32)
    wgt = rng.uniform(0, 2, size=(8, 5)).astype(np.float32)
    uniq_g, row_sel, inv2, keep = dedupe_two_level(idx, 200, 48, group=8)
    assert (keep == 1.0).all()
    compact = gather_compact(table, jnp.asarray(uniq_g), 8)
    out = lookup_from_compact(compact, jnp.asarray(inv2), jnp.asarray(wgt),
                              row_sel=jnp.asarray(row_sel))
    ref = embedding_bag_xla(table, jnp.asarray(idx), jnp.asarray(wgt))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
