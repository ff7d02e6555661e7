"""Stochastic-rounding bf16 table updates (kernels/stochastic.py + the SR
scatter paths in train/sparse_update.py and parallel/sparse_step.py).

Key properties tested:
  - exactness: bf16-representable values round to themselves (zero updates
    leave the table bit-identical)
  - unbiasedness: E[SR(x)] == x for x between bf16 neighbors — the property
    that lets sub-ulp SGD steps accumulate where round-to-nearest stalls
  - accumulation: repeated sub-ulp updates move a bf16 table by the right
    total in expectation
  - end-to-end: tiny DSSM with a bf16 table trains on CPU
  - SPMD: the vocab-sharded SR scatter applies each shard's owned rows once
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.kernels.stochastic import (
    sr_add_rows,
    sr_bits,
    stochastic_round_bf16,
)


def _bits(seed, shape):
    return jax.random.bits(jax.random.PRNGKey(seed), shape, dtype=jnp.uint32)


def test_sr_exact_for_representable():
    # Values already representable in bf16 (incl. 0, negatives, subnormal-ish)
    vals = jnp.asarray(
        [0.0, -0.0, 1.0, -1.0, 0.5, 3.140625, -65504.0, 2.0**-20], jnp.float32
    )
    vals = vals.astype(jnp.bfloat16).astype(jnp.float32)  # snap to bf16 grid
    for seed in range(5):
        out = stochastic_round_bf16(vals, _bits(seed, vals.shape))
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(vals, np.float32)
        )


def test_sr_rounds_to_neighbors_only():
    # x strictly between two bf16 neighbors must round to one of them.
    lo = jnp.float32(1.0)
    hi = jnp.float32(1.0 + 0.0078125)  # next bf16 above 1.0 (ulp = 2^-7)
    x = jnp.full((4096,), 1.0 + 0.3 * 0.0078125, jnp.float32)  # ulp(1)=2^-7
    out = np.asarray(
        stochastic_round_bf16(x, _bits(0, x.shape)), np.float32
    )
    assert set(np.unique(out)) <= {np.float32(lo), np.float32(hi)}, out


def test_sr_unbiased():
    # E[SR(x)] = x: fraction of up-rounds equals the sub-ulp fraction.
    frac = 0.3
    ulp = 0.0078125  # bf16 ulp at 1.0 (2^-7)
    n = 200_000
    x = jnp.full((n,), 1.0 + frac * ulp, jnp.float32)
    out = np.asarray(stochastic_round_bf16(x, _bits(1, x.shape)), np.float32)
    up = (out > 1.0).mean()
    assert abs(up - frac) < 0.01, up
    # Round-to-nearest comparison: all of these collapse to 1.0.
    rtn = np.asarray(x.astype(jnp.bfloat16), np.float32)
    assert (rtn == 1.0).all()


def test_sr_accumulates_sub_ulp_updates():
    # 1000 updates of +1e-4 on a weight of 1.0: RTN stays at 1.0 forever
    # (1e-4 < ulp/2 = 0.0039); SR lands near 1.1 in expectation.
    rows = jnp.ones((16, 128), jnp.bfloat16)
    vals = jnp.full((16, 128), 1e-4, jnp.float32)
    steps = 1000
    for s in range(steps):
        rows = sr_add_rows(rows, vals, jnp.int32(s))
    mean = float(np.asarray(rows, np.float32).mean())
    assert abs(mean - 1.1) < 0.01, mean
    rtn = jnp.ones((4,), jnp.bfloat16)
    rtn = (rtn.astype(jnp.float32) + 1e-4).astype(jnp.bfloat16)
    assert float(rtn[0]) == 1.0


def test_sr_bits_varies_with_seed():
    a = sr_bits(jnp.int32(1), (256,))
    b = sr_bits(jnp.int32(2), (256,))
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def _bf16_cfg(vocab=4096, batch=64):
    from dssm_tpu.config import get_preset, validate

    cfg = get_preset("tiny")
    cfg = cfg.replace(
        tower=cfg.tower.replace(vocab_size=vocab, embed_width=64,
                                hidden_dims=(48,), semantic_dim=32,
                                table_dtype="bfloat16"),
        data=cfg.data.replace(max_unique=1024, max_unique_rows=256,
                              toy_num_pairs=512, toy_vocab_words=128),
        train=cfg.train.replace(batch_size=batch, use_pallas=False,
                                max_steps=60, learning_rate=0.05),
    )
    return validate(cfg)


def _toy_batches(cfg, n_batches, seed=0, group=16):
    from dssm_tpu.data import hash_pairs, make_toy_pairs, select_batch

    pairs = make_toy_pairs(cfg.data.toy_num_pairs,
                           vocab_words=cfg.data.toy_vocab_words, seed=seed)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        rows = rng.choice(cfg.data.toy_num_pairs, cfg.train.batch_size,
                          replace=False)
        out.append(select_batch(
            hashed, rows, cfg.tower.is_sequence_model,
            dedup_unique=cfg.data.max_unique, dedup_group=group,
            dedup_unique_rows=cfg.data.max_unique_rows,
        ))
    return out


def test_bf16_table_trains_e2e():
    from dssm_tpu.models import base as model_base
    from dssm_tpu.train.sparse_update import make_sparse_train_step
    from dssm_tpu.train.state import create_run_state

    cfg = _bf16_cfg()
    params = model_base.init_params(cfg.tower, seed=0)
    table = params["shared"][model_base.TABLE_KEY["mlp"]]
    assert table.dtype == jnp.bfloat16
    table0 = np.asarray(table, np.float32).copy()  # state is donated below
    state = create_run_state(cfg, params)
    step = make_sparse_train_step(cfg)
    batches = _toy_batches(cfg, 8)
    losses = []
    for i in range(40):
        state, aux = step(state, batches[i % len(batches)])
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    new_table = state.params["shared"][model_base.TABLE_KEY["mlp"]]
    assert new_table.dtype == jnp.bfloat16
    # The table actually moved (SR lets sub-ulp SGD steps land).
    assert not np.array_equal(table0, np.asarray(new_table, np.float32))


def test_bf16_tracks_f32_trajectory():
    # Same data, same seeds: the bf16+SR run's loss should track the f32
    # run's loss closely (SR noise, not divergence).
    from dssm_tpu.models import base as model_base
    from dssm_tpu.train.sparse_update import make_sparse_train_step
    from dssm_tpu.train.state import create_run_state

    losses = {}
    for td, group in (("", 8), ("bfloat16", 16)):
        cfg = _bf16_cfg()
        cfg = cfg.replace(tower=cfg.tower.replace(table_dtype=td))
        params = model_base.init_params(cfg.tower, seed=0)
        state = create_run_state(cfg, params)
        step = make_sparse_train_step(cfg)
        ls = []
        for i, b in enumerate(_toy_batches(cfg, 30, group=group)):
            state, aux = step(state, b)
            ls.append(float(aux["loss"]))
        losses[td or "f32"] = ls
    f32, bf16 = np.array(losses["f32"]), np.array(losses["bfloat16"])
    # Early trajectory tracks closely (SR noise hasn't compounded yet);
    # later, per-step losses are noisy on the tiny toy set, so compare
    # windowed means: bf16 converges to the same neighborhood as f32.
    rel = np.abs(f32 - bf16) / np.maximum(np.abs(f32), 1e-3)
    assert rel[:5].max() < 0.15, rel[:5]
    assert bf16[-10:].mean() < 1.4 * f32[-10:].mean() + 0.1, (
        f32[-10:].mean(), bf16[-10:].mean())
    assert bf16[-5:].mean() < 0.5 * bf16[:5].mean(), (bf16[:5], bf16[-5:])


def test_sharded_sr_scatter_parity():
    # Vocab-sharded SR set vs single-device SR set: identical row SUPPORT and
    # statistically identical values (different streams). Use exactly-
    # representable vals so SR is deterministic -> bitwise parity.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dssm_tpu.kernels.sharded_embed import scatter_sr_groups_sharded

    group, mp = 16, 4
    v, h = 64 * group * mp, 128
    devices = np.array(jax.devices()[:mp])
    mesh = Mesh(devices.reshape(mp), ("model",))
    table = jnp.ones((v, h), jnp.bfloat16)
    gids = jnp.asarray([0, 7, 63, 64, 130, 200, 255, 17], jnp.int32)
    # vals = 0.5 -> 1.5 exactly representable in bf16: SR exact.
    vals = jnp.full((gids.shape[0] * group, h), 0.5, jnp.float32)
    sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    out = scatter_sr_groups_sharded(sharded, gids, vals, mesh, group,
                                    jnp.int32(3))
    out = np.asarray(out, np.float32)
    expected = np.ones((v, h), np.float32)
    for gid in np.asarray(gids):
        expected[gid * group:(gid + 1) * group] = 1.5
    np.testing.assert_array_equal(out, expected)


def test_sparse_spmd_bf16_step():
    # Full SPMD sparse step with a bf16 table on a dp=4 x mp=2 CPU mesh.
    from dssm_tpu.parallel.mesh import make_mesh
    from dssm_tpu.parallel.train_step import (
        create_sharded_state,
        make_parallel_train_step,
        shard_batch,
    )

    cfg = _bf16_cfg(vocab=2048, batch=32)
    cfg = cfg.replace(
        mesh=cfg.mesh.replace(data_parallel=4, model_parallel=2),
        data=cfg.data.replace(max_unique=512, max_unique_rows=128),
    )
    from dssm_tpu.config import validate
    from dssm_tpu.models import base as model_base

    cfg = validate(cfg)
    mesh = make_mesh(cfg.mesh, jax.devices()[:8])
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_sharded_state(cfg, mesh, params)
    step = make_parallel_train_step(cfg, mesh, impl="xla")
    batches = _toy_batches(cfg, 6)
    with mesh:
        losses = []
        for b in batches:
            state, aux = step(state, shard_batch(b, mesh))
            losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    table = state.params["shared"][model_base.TABLE_KEY["mlp"]]
    assert table.dtype == jnp.bfloat16


def test_validate_rejects_bf16_without_sparse_path():
    from dssm_tpu.config import get_preset, validate

    cfg = get_preset("tiny")
    cfg = cfg.replace(
        tower=cfg.tower.replace(table_dtype="bfloat16"),
        train=cfg.train.replace(sparse_embed_update=False),
    )
    with pytest.raises(ValueError, match="bfloat16"):
        validate(cfg)


def test_pallas_sr_scatter_interpret():
    # Interpret-mode check of the Pallas SR scatter; skipped if the
    # interpreter lacks TPU PRNG support.
    from dssm_tpu.kernels.pallas_gather import scatter_sr_row_groups

    group = 16
    v, h = 32 * group, 128
    table = jnp.ones((v, h), jnp.bfloat16)
    gids = jnp.asarray([1, 5, 9, 30, 2, 0, 31, 7], jnp.int32)
    vals = jnp.full((gids.shape[0] * group, h), 0.25, jnp.float32)
    try:
        out = scatter_sr_row_groups(table, gids, vals, group, jnp.int32(0),
                                    interpret=True, groups_per_step=8)
    except Exception as e:  # pragma: no cover - interpreter capability
        pytest.skip(f"interpret-mode TPU PRNG unsupported: {e}")
    out = np.asarray(out, np.float32)
    expected = np.ones((v, h), np.float32)
    for gid in np.asarray(gids):
        expected[gid * group:(gid + 1) * group] = 1.25
    np.testing.assert_array_equal(out, expected)


def test_pallas_sr_int8_scatter_interpret():
    # Interpret-mode check of the int8-grid Pallas SR scatter (skipped if
    # the interpreter lacks TPU PRNG). Integer-valued grid updates round
    # exactly (u < 1 cannot carry past an integer), so the result is
    # deterministic despite the stochastic path.
    from dssm_tpu.kernels.pallas_gather import scatter_sr_int8_row_groups

    group = 32
    v, h = 16 * group, 128
    table = jnp.full((v, h), 3, jnp.int8)
    gids = jnp.asarray([1, 5, 9, 2, 0, 15, 7, 11], jnp.int32)
    vals_grid = jnp.full((gids.shape[0] * group, h), 2.0, jnp.float32)
    try:
        out = scatter_sr_int8_row_groups(table, gids, vals_grid, group,
                                         jnp.int32(0), interpret=True,
                                         groups_per_step=8)
    except Exception as e:  # pragma: no cover - interpreter capability
        pytest.skip(f"interpret-mode TPU PRNG unsupported: {e}")
    out = np.asarray(out, np.int32)
    expected = np.full((v, h), 3, np.int32)
    for gid in np.asarray(gids):
        expected[gid * group:(gid + 1) * group] = 5
    np.testing.assert_array_equal(out, expected)
