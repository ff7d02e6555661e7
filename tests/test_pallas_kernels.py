"""Pallas kernels vs their XLA-composition fallbacks, run in interpreter mode
on CPU (SURVEY.md §5.2: every kernel parity-tested against the fallback).
Real-TPU execution of the same kernels is exercised by bench.py and was
validated on hardware; these tests pin the math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dssm_tpu.kernels.pallas_gather import gather_row_groups, scatter_add_row_groups
from dssm_tpu.kernels.pallas_loss import in_batch_loss_pallas
from dssm_tpu.kernels.pallas_tower import dense_tower_pallas
from dssm_tpu.kernels.tower import dense_tower_xla
from dssm_tpu.loss.cosine_softmax import in_batch_loss_xla


def _unit_rows(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


def test_loss_kernel_forward_matches_xla():
    rng = np.random.default_rng(0)
    qh, dh = _unit_rows(rng, 256, 128), _unit_rows(rng, 512, 128)
    labels = jnp.asarray(rng.integers(0, 512, 256).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        loss_p, aux_p = in_batch_loss_pallas(qh, dh, 20.0, labels)
    loss_x, aux_x = in_batch_loss_xla(qh, dh, 20.0, labels)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    np.testing.assert_allclose(float(aux_p["in_batch_recall@1"]),
                               float(aux_x["in_batch_recall@1"]), atol=1e-6)
    np.testing.assert_allclose(float(aux_p["pos_cos"]),
                               float(aux_x["pos_cos"]), rtol=1e-5)


def test_loss_kernel_grads_match_xla():
    rng = np.random.default_rng(1)
    qh, dh = _unit_rows(rng, 256, 128), _unit_rows(rng, 256, 128)

    def f_pallas(q, d):
        return in_batch_loss_pallas(q, d, 20.0)[0]

    def f_xla(q, d):
        return in_batch_loss_xla(q, d, 20.0)[0]

    # context must span the backward trace too (custom_vjp bwd kernels)
    with pltpu.force_tpu_interpret_mode():
        gq_p, gd_p = jax.grad(f_pallas, argnums=(0, 1))(qh, dh)
    gq_x, gd_x = jax.grad(f_xla, argnums=(0, 1))(qh, dh)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x),
                               rtol=1e-4, atol=1e-6)


def test_loss_kernel_falls_back_on_odd_batch():
    rng = np.random.default_rng(2)
    qh, dh = _unit_rows(rng, 100, 128), _unit_rows(rng, 100, 128)  # 100 % 256 != 0
    loss_p, _ = in_batch_loss_pallas(qh, dh, 20.0)  # silently uses XLA path
    loss_x, _ = in_batch_loss_xla(qh, dh, 20.0)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-6)


@pytest.mark.parametrize("activation", ["tanh", "relu"])
def test_tower_kernel_matches_xla(activation):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(256, 300)).astype(np.float32))
    layers = [
        (jnp.asarray(rng.normal(size=(300, 300)).astype(np.float32) * 0.05),
         jnp.asarray(rng.normal(size=(300,)).astype(np.float32) * 0.05)),
        (jnp.asarray(rng.normal(size=(300, 128)).astype(np.float32) * 0.05),
         jnp.asarray(rng.normal(size=(128,)).astype(np.float32) * 0.05)),
    ]
    with pltpu.force_tpu_interpret_mode():
        y_p = dense_tower_pallas(x, layers, activation, normalize=True)
    y_x = dense_tower_xla(x, layers, activation, normalize=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-5, atol=1e-6)


def test_tower_kernel_grads_match_xla():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    layers = [
        (jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.1),
         jnp.asarray(np.zeros(32, np.float32))),
    ]

    def f_pallas(x, w, b):
        return dense_tower_pallas(x, [(w, b)], "tanh", True).sum()

    def f_xla(x, w, b):
        return dense_tower_xla(x, [(w, b)], "tanh", True).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, *layers[0])
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, *layers[0])
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_gather_scatter_kernels_interpret():
    rng = np.random.default_rng(5)
    v, h, g, grp = 256, 128, 8, 8
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    gids = jnp.asarray(rng.choice(v // grp, size=g, replace=False).astype(np.int32))
    rows = (np.asarray(gids)[:, None] * grp + np.arange(grp)[None, :]).reshape(-1)

    out = gather_row_groups(table, gids, grp, interpret=True, groups_per_step=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[rows],
                               rtol=1e-6)

    vals = jnp.asarray(rng.normal(size=(g * grp, h)).astype(np.float32))
    updated = scatter_add_row_groups(table, gids, vals, grp, interpret=True,
                                     groups_per_step=4)
    ref = np.asarray(table).copy()
    ref[rows] += np.asarray(vals)
    np.testing.assert_allclose(np.asarray(updated), ref, rtol=1e-6)


def test_count_lookup_kernel_matches_xla():
    from dssm_tpu.kernels.pallas_count import count_lookup_pallas
    from dssm_tpu.kernels.dedup_embed import lookup_from_compact

    rng = np.random.default_rng(6)
    rows, k, u2, h = 256, 16, 128, 128
    compact2 = jnp.asarray(rng.normal(size=(u2, h)).astype(np.float32))
    inv = jnp.asarray(rng.integers(0, u2, size=(rows, k)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, k)).astype(np.float32))

    out = count_lookup_pallas(compact2, inv, wgt, interpret=True)
    assert out is not None
    ref = lookup_from_compact(compact2, inv, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_count_lookup_kernel_grads_match_xla():
    from dssm_tpu.kernels.pallas_count import count_lookup_pallas
    from dssm_tpu.kernels.dedup_embed import lookup_from_compact

    rng = np.random.default_rng(7)
    rows, k, u2, h = 128, 8, 128, 128
    compact2 = jnp.asarray(rng.normal(size=(u2, h)).astype(np.float32))
    inv = jnp.asarray(rng.integers(0, u2, size=(rows, k)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, k)).astype(np.float32))

    g_p = jax.grad(
        lambda c: (count_lookup_pallas(c, inv, wgt, interpret=True) ** 2).sum()
    )(compact2)
    g_x = jax.grad(lambda c: (lookup_from_compact(c, inv, wgt) ** 2).sum())(
        compact2
    )
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4,
                               atol=1e-5)


def test_count_lookup_kernel_rejects_bad_shapes():
    from dssm_tpu.kernels.pallas_count import count_lookup_pallas

    compact2 = jnp.zeros((100, 128))  # u2 not 128-multiple
    inv = jnp.zeros((64, 8), jnp.int32)
    wgt = jnp.zeros((64, 8), jnp.float32)
    assert count_lookup_pallas(compact2, inv, wgt, interpret=True) is None


def test_count_lookup_kmax_skip_exact_with_ragged_rows():
    """The K-chunk skip (kernels/pallas_count._tile_kmax) must be exact for
    the real weight patterns: ragged nonzero prefixes (hash padding),
    INTERIOR zeros (keep-dropped overflow lookups), and all-zero rows —
    fwd and grad."""
    from dssm_tpu.kernels.dedup_embed import lookup_from_compact
    from dssm_tpu.kernels.pallas_count import count_lookup_pallas

    rng = np.random.default_rng(8)
    rows, k, u2, h = 256, 32, 128, 128
    compact2 = jnp.asarray(rng.normal(size=(u2, h)).astype(np.float32))
    inv = rng.integers(0, u2, size=(rows, k)).astype(np.int32)
    wgt = rng.uniform(0.5, 2, size=(rows, k)).astype(np.float32)
    nnz = rng.integers(0, k + 1, size=(rows,))
    wgt[np.arange(k)[None, :] >= nnz[:, None]] = 0.0  # ragged prefixes
    wgt[5, 2] = 0.0  # interior zero (keep-dropped lookup)
    wgt[17] = 0.0  # fully dropped row
    # entries past the prefix keep junk inv values — skip must not read them
    inv[np.arange(k)[None, :] >= nnz[:, None]] = u2 - 1
    inv, wgt = jnp.asarray(inv), jnp.asarray(wgt)

    out = count_lookup_pallas(compact2, inv, wgt, interpret=True)
    ref = lookup_from_compact(compact2, inv, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    g_p = jax.grad(
        lambda c: (count_lookup_pallas(c, inv, wgt, interpret=True) ** 2).sum()
    )(compact2)
    g_x = jax.grad(lambda c: (lookup_from_compact(c, inv, wgt) ** 2).sum())(
        compact2
    )
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4,
                               atol=1e-5)


def test_sort_batch_rows_invariance():
    """sort_batch_rows is a pure joint permutation: loss identical, and the
    per-tile kmax bound shrinks for short-row tiles."""
    from dssm_tpu.config import (
        DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
    )
    from dssm_tpu.data import loader, toy
    from dssm_tpu.models import base as mb
    from dssm_tpu.train.loop import make_train_step
    from dssm_tpu.train.state import create_state

    cfg = RunConfig(
        tower=TowerConfig(vocab_size=4096, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=2048, max_unique_rows=512),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=64, use_pallas=False),
    )
    pairs = toy.make_toy_pairs(64, vocab_words=64, seed=11)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    batch = loader.select_batch(
        hashed, np.arange(64), False, dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows, dedup_joint=True,
    )
    sorted_batch = loader.sort_batch_rows(batch)
    # same pairs, new order
    key = lambda b: sorted(map(tuple, np.asarray(b["q_wgt"])))
    assert key(batch) == key(sorted_batch)
    assert not np.array_equal(batch["q_wgt"], sorted_batch["q_wgt"])
    # nnz descending along rows
    nnz = (np.asarray(sorted_batch["d_wgt"]) != 0).sum(axis=1)
    assert (np.diff(nnz) <= 0).all()

    step = make_train_step(cfg, impl="xla")
    s1, a1 = step(create_state(mb.init_params(cfg.tower, seed=0), cfg.train),
                  batch)
    s2, a2 = step(create_state(mb.init_params(cfg.tower, seed=0), cfg.train),
                  sorted_batch)
    np.testing.assert_allclose(float(a1["loss"]), float(a2["loss"]),
                               rtol=1e-6)


def test_embedding_bag_kernel_matches_xla():
    from dssm_tpu.kernels.pallas_embed import embedding_bag_pallas
    from dssm_tpu.kernels.sparse_embed import embedding_bag_xla

    rng = np.random.default_rng(8)
    v, h, rows, k = 256, 64, 32, 8
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, v, size=(rows, k)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, k)).astype(np.float32))
    # zero-weight padding entries must not contribute
    wgt = wgt.at[:, -1].set(0.0)

    out = embedding_bag_pallas(table, idx, wgt, interpret=True)
    assert out is not None
    ref = embedding_bag_xla(table, idx, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_embedding_bag_kernel_sequence_shapes():
    from dssm_tpu.kernels.pallas_embed import embedding_bag_pallas
    from dssm_tpu.kernels.sparse_embed import embedding_bag_xla

    rng = np.random.default_rng(9)
    v, h, b, t, k = 128, 32, 4, 8, 4
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, v, size=(b, t, k)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(b, t, k)).astype(np.float32))

    out = embedding_bag_pallas(table, idx, wgt, interpret=True)
    assert out is not None and out.shape == (b, t, h)
    ref = embedding_bag_xla(table, idx, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_embedding_bag_kernel_grads_match_xla():
    from dssm_tpu.kernels.pallas_embed import embedding_bag_pallas
    from dssm_tpu.kernels.sparse_embed import embedding_bag_xla

    rng = np.random.default_rng(10)
    v, h, rows, k = 128, 32, 16, 8
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, v, size=(rows, k)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, k)).astype(np.float32))

    def loss_p(t, w):
        return (embedding_bag_pallas(t, idx, w, interpret=True) ** 2).sum()

    def loss_x(t, w):
        return (embedding_bag_xla(t, idx, w) ** 2).sum()

    gt_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(table, wgt)
    gt_x, gw_x = jax.grad(loss_x, argnums=(0, 1))(table, wgt)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), rtol=1e-4,
                               atol=1e-4)


def test_embedding_bag_kernel_rejects_bad_shapes():
    from dssm_tpu.kernels.pallas_embed import embedding_bag_pallas

    table = jnp.zeros((100, 32))  # vocab not a multiple of the f32 group (8)
    idx = jnp.zeros((16, 4), jnp.int32)
    wgt = jnp.zeros((16, 4), jnp.float32)
    assert embedding_bag_pallas(table, idx, wgt, interpret=True) is None


def _joint_inputs(seed=9, rows=256, kq=8, kd=16, gr=256, u2=128, h=128,
                  dtype=np.float32):
    rng = np.random.default_rng(seed)
    compact = jnp.asarray(rng.normal(size=(gr, h)).astype(dtype))
    # row_sel: distinct compact rows (sorted prefix), padded with 0
    sel = np.zeros((u2,), dtype=np.int32)
    picked = np.sort(rng.choice(gr, size=u2 - 8, replace=False))
    sel[:u2 - 8] = picked
    q_inv = jnp.asarray(rng.integers(0, u2, size=(rows, kq)).astype(np.int32))
    q_wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, kq)).astype(np.float32))
    d_inv = jnp.asarray(rng.integers(0, u2, size=(rows, kd)).astype(np.int32))
    d_wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, kd)).astype(np.float32))
    return compact, jnp.asarray(sel), q_inv, q_wgt, d_inv, d_wgt


def _joint_ref(compact, sel, q_inv, q_wgt, d_inv, d_wgt):
    from dssm_tpu.kernels.dedup_embed import lookup_from_compact, select_rows

    c2 = select_rows(compact, sel)
    return (lookup_from_compact(c2, q_inv, q_wgt),
            lookup_from_compact(c2, d_inv, d_wgt))


def test_joint_lookup_kernel_matches_xla():
    """Fused select+count+matmul joint kernel (VERDICT r3 directive 3):
    forward parity for both towers, including asymmetric Kq != Kd."""
    from dssm_tpu.kernels.pallas_count import joint_lookup_pallas

    compact, sel, q_inv, q_wgt, d_inv, d_wgt = _joint_inputs()
    out = joint_lookup_pallas(compact, sel, q_inv, q_wgt, d_inv, d_wgt,
                              interpret=True)
    assert out is not None
    refs = _joint_ref(compact, sel, q_inv, q_wgt, d_inv, d_wgt)
    for got, want, name in zip(out, refs, ("q", "d")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_joint_lookup_kernel_grads_match_xla():
    """The fused bwd kernel yields the COMBINED d_compact (both towers'
    contributions through the select transpose) in one pass."""
    from dssm_tpu.kernels.pallas_count import joint_lookup_pallas

    compact, sel, q_inv, q_wgt, d_inv, d_wgt = _joint_inputs(seed=10)

    def loss_p(c):
        qo, do = joint_lookup_pallas(c, sel, q_inv, q_wgt, d_inv, d_wgt,
                                     interpret=True)
        return (qo ** 2).sum() + 0.5 * (do ** 2).sum()

    def loss_x(c):
        qo, do = _joint_ref(c, sel, q_inv, q_wgt, d_inv, d_wgt)
        return (qo ** 2).sum() + 0.5 * (do ** 2).sum()

    g_p = jax.grad(loss_p)(compact)
    g_x = jax.grad(loss_x)(compact)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4,
                               atol=1e-4)


def test_joint_lookup_kernel_select_chunking():
    """gr spanning multiple _SEL_CHUNK column chunks (the in-kernel one-hot
    select is built chunked to bound VMEM temporaries)."""
    from dssm_tpu.kernels.pallas_count import joint_lookup_pallas

    compact, sel, q_inv, q_wgt, d_inv, d_wgt = _joint_inputs(
        seed=11, gr=1152, u2=256)
    out = joint_lookup_pallas(compact, sel, q_inv, q_wgt, d_inv, d_wgt,
                              interpret=True)
    assert out is not None
    refs = _joint_ref(compact, sel, q_inv, q_wgt, d_inv, d_wgt)
    for got, want, name in zip(out, refs, ("q", "d")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_joint_lookup_kernel_rejects_bad_shapes():
    from dssm_tpu.kernels.pallas_count import joint_lookup_pallas

    compact, sel, q_inv, q_wgt, d_inv, d_wgt = _joint_inputs()
    # u2 not a multiple of 128
    assert joint_lookup_pallas(compact, sel[:100], q_inv, q_wgt, d_inv,
                               d_wgt, interpret=True) is None
    # VMEM budget: multihost caps (gr=16384, u2=8192, h=384) must fall back
    big_c = jnp.zeros((16384, 384), jnp.float32)
    big_sel = jnp.zeros((8192,), jnp.int32)
    assert joint_lookup_pallas(big_c, big_sel, q_inv, q_wgt, d_inv, d_wgt,
                               interpret=True) is None


def test_count_lookup_u2_blocked_matches_xla():
    """Multihost-cap shapes (u2=8192, h=384) exceed single-block VMEM; the
    kernel must run column-blocked (j grid) with identical results — fwd and
    grad (VERDICT r3 directives 1/7: the preset caps must execute on the
    Pallas path, not silently fall back)."""
    from dssm_tpu.kernels.dedup_embed import lookup_from_compact
    from dssm_tpu.kernels.pallas_count import _u2_block, count_lookup_pallas

    rng = np.random.default_rng(12)
    rows, k, u2, h = 256, 8, 8192, 384
    assert _u2_block(u2, h, 256, 4) not in (None, u2)  # really blocked
    compact2 = jnp.asarray(rng.normal(size=(u2, h)).astype(np.float32))
    inv = jnp.asarray(rng.integers(0, u2, size=(rows, k)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(rows, k)).astype(np.float32))

    out = count_lookup_pallas(compact2, inv, wgt, interpret=True)
    assert out is not None
    ref = lookup_from_compact(compact2, inv, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    g_p = jax.grad(
        lambda c: (count_lookup_pallas(c, inv, wgt, interpret=True) ** 2).sum()
    )(compact2)
    g_x = jax.grad(lambda c: (lookup_from_compact(c, inv, wgt) ** 2).sum())(
        compact2)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4,
                               atol=1e-4)


def test_fused_gather_joint_lookup_matches_reference():
    """The fully fused gather+select+count kernel (one dispatch for the
    lookup front half) vs gather_compact + the select/count reference;
    explicit joint_lookup_bwd vs autodiff through the reference."""
    from dssm_tpu.kernels.dedup_embed import (
        SKIP_SENTINEL_GID, gather_compact)
    from dssm_tpu.kernels.pallas_count import (
        fused_gather_joint_lookup, joint_lookup_bwd)
    from dssm_tpu.kernels.pallas_gather import force_interpret

    rng = np.random.default_rng(14)
    v, h, group = 4096, 128, 8
    g_slots, u2, rows, kq, kd = 64, 128, 256, 8, 16
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    gids = np.sort(rng.choice(v // group, size=40, replace=False))
    uniq = np.full((g_slots,), SKIP_SENTINEL_GID, np.int32)
    uniq[:40] = gids
    gr = g_slots * group
    sel = np.zeros((u2,), np.int32)
    sel[:100] = np.sort(rng.choice(40 * group, size=100, replace=False))
    q_inv = jnp.asarray(rng.integers(0, u2, (rows, kq)).astype(np.int32))
    q_wgt = jnp.asarray(rng.uniform(0, 2, (rows, kq)).astype(np.float32))
    d_inv = jnp.asarray(rng.integers(0, u2, (rows, kd)).astype(np.int32))
    d_wgt = jnp.asarray(rng.uniform(0, 2, (rows, kd)).astype(np.float32))
    uniq, sel = jnp.asarray(uniq), jnp.asarray(sel)

    with force_interpret():
        out = fused_gather_joint_lookup(table, uniq, sel, q_inv, q_wgt,
                                        d_inv, d_wgt, group)
    assert out is not None
    qo, do, cnt_q, cnt_d, compact = out

    c_ref = gather_compact(table, uniq, group, impl="xla")
    q_ref, d_ref = _joint_ref(c_ref, sel, q_inv, q_wgt, d_inv, d_wgt)
    np.testing.assert_allclose(np.asarray(qo), np.asarray(q_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(do), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
    # Compact parity on REAL rows only (sentinel rows are unwritten by
    # contract — nothing downstream reads them).
    real = 40 * group
    np.testing.assert_allclose(np.asarray(compact)[:real],
                               np.asarray(c_ref)[:real], rtol=1e-6)

    # Explicit bwd from residuals == autodiff through the reference.
    gq = jnp.asarray(rng.normal(size=(rows, h)).astype(np.float32))
    gd = jnp.asarray(rng.normal(size=(rows, h)).astype(np.float32))

    def ref_loss(c):
        q2, d2 = _joint_ref(c, sel, q_inv, q_wgt, d_inv, d_wgt)
        return (q2 * gq).sum() + (d2 * gd).sum()

    g_ref = jax.grad(ref_loss)(c_ref)
    with force_interpret():
        g_c = joint_lookup_bwd(sel, cnt_q, cnt_d, gq, gd, gr, h,
                               jnp.float32)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_gather_joint_step_matches_xla():
    """Single-device sparse train step, impl="pallas" (interpret mode) vs
    the XLA path: loss and updated table parity over 2 steps. (The fully
    fused gather variant measured slower on chip and is not wired into the
    step — this certifies the shipping split-kernel path, which no other
    test drove single-device with impl="pallas".)"""
    from dssm_tpu.config import (
        DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
    )
    from dssm_tpu.data import loader, toy
    from dssm_tpu.kernels.pallas_gather import force_interpret
    from dssm_tpu.models import base as mb
    from dssm_tpu.train.loop import make_train_step
    from dssm_tpu.train.state import create_state

    cfg = RunConfig(
        tower=TowerConfig(vocab_size=4096, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=2048,
                        max_unique_rows=512),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=64, learning_rate=0.1,
                          use_pallas=False),
    )
    pairs = toy.make_toy_pairs(64, vocab_words=64, seed=13)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    batch = loader.select_batch(
        hashed, np.arange(64), False, dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows, dedup_joint=True)

    ref_state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    ref_step = make_train_step(cfg, impl="xla")
    losses_ref = []
    for _ in range(2):
        ref_state, aux = ref_step(ref_state, batch)
        losses_ref.append(float(aux["loss"]))

    state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    losses = []
    with force_interpret():
        step = make_train_step(cfg, impl="pallas")
        for _ in range(2):
            state, aux = step(state, batch)
            losses.append(float(aux["loss"]))
    np.testing.assert_allclose(losses, losses_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.params["shared"]["W0"]),
        np.asarray(ref_state.params["shared"]["W0"]), rtol=1e-4, atol=1e-6)


def test_rank_kernel_matches_xla_scan():
    """Streaming Pallas rank kernel (r5) vs the XLA d-chunked scan and a
    numpy oracle — ragged sizes exercise both row and column padding + the
    self-exclusion mask."""
    from dssm_tpu.kernels.pallas_gather import force_interpret
    from dssm_tpu.kernels.pallas_rank import rank_counts_pallas
    from dssm_tpu.train.eval import _rank_all

    rng = np.random.default_rng(3)
    for n in (96, 600):
        q = rng.standard_normal((n, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        d = (q + 0.4 * rng.standard_normal((n, 128)).astype(np.float32))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        want = np.asarray(_rank_all(jnp.asarray(q), jnp.asarray(d),
                                    min(1024, n), min(4096, n)))
        with force_interpret():
            got = np.asarray(rank_counts_pallas(jnp.asarray(q),
                                                jnp.asarray(d)))
        np.testing.assert_array_equal(got, want, err_msg=str(n))
