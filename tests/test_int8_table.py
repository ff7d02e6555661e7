"""int8 quantized embedding table (tower.table_dtype="int8"): per-row f32
scale, dequantized compact lookups, stochastic-rounding grid updates.
Quarters table HBM/DMA bytes vs f32 (VERDICT r3 directive 9)."""

import jax
import jax.numpy as jnp
import numpy as np

from dssm_tpu.config import (
    DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig, validate,
)
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as mb
from dssm_tpu.train.loop import make_train_step, train
from dssm_tpu.train.state import create_run_state

B = 64


def _cfg(table_dtype=""):
    return validate(RunConfig(
        tower=TowerConfig(vocab_size=16384, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16, table_dtype=table_dtype),
        data=DataConfig(max_trigrams=32, max_unique=2048, max_unique_rows=512),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=B, learning_rate=0.1, use_pallas=False),
    ))


def _batches(cfg, group):
    pairs = toy.make_toy_pairs(512, vocab_words=64, seed=5)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    return hashed, loader.batch_iterator(
        hashed, B, False, seed=1,
        dedup_unique=cfg.data.max_unique, dedup_group=group,
        dedup_unique_rows=cfg.data.max_unique_rows,
        dedup_joint=cfg.tower.shared_weights,
    )


def test_init_quantization_roundtrip():
    cfg = _cfg("int8")
    params = mb.init_params(cfg.tower, seed=0)
    q = params["shared"]["W0"]
    scale = params["shared"]["W0_scale"]
    assert q.dtype == jnp.int8 and scale.shape == (q.shape[0], 1)
    f32 = mb.init_params(cfg.tower.replace(table_dtype=""),
                         seed=0)["shared"]["W0"]
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    err = np.abs(deq - np.asarray(f32))
    # round-to-nearest at init: error bounded by half a grid step per row
    assert np.all(err <= np.asarray(scale) * 0.5 + 1e-7)


def test_int8_embed_matches_dequantized_f32_table():
    """The dequantized-compact lookup must equal running the same math on a
    f32 table holding exactly q*scale."""
    cfg = _cfg("int8")
    params = mb.init_params(cfg.tower, seed=0)
    q8 = params["shared"]["W0"]
    scale = params["shared"]["W0_scale"]
    f32_params = {"shared": dict(params["shared"])}
    del f32_params["shared"]["W0_scale"]
    f32_params["shared"]["W0"] = (q8.astype(jnp.float32) * scale)

    _, it8 = _batches(cfg, 32)
    batch8 = next(it8)
    cfg_f = _cfg("")
    _, itf = _batches(cfg_f, 8)
    batch_f = next(itf)

    batch8 = {k: jnp.asarray(v) for k, v in batch8.items()}
    batch_f = {k: jnp.asarray(v) for k, v in batch_f.items()}
    e8 = mb.embed(params, cfg.tower, "q", batch8, impl="xla")
    ef = mb.embed(f32_params, cfg_f.tower, "q", batch_f, impl="xla")
    np.testing.assert_allclose(np.asarray(e8), np.asarray(ef), rtol=1e-5,
                               atol=1e-6)


def test_stochastic_round_int8_unbiased_and_exact_on_grid():
    from dssm_tpu.kernels.stochastic import sr_bits, stochastic_round_int8

    x = jnp.full((20000,), 3.3, jnp.float32)
    bits = sr_bits(jnp.int32(7), x.shape)
    r = stochastic_round_int8(x, bits)
    assert set(np.unique(np.asarray(r))) <= {3, 4}
    np.testing.assert_allclose(float(np.asarray(r, np.float32).mean()), 3.3,
                               atol=0.02)
    # exact grid points never move
    g = stochastic_round_int8(jnp.full((1000,), -5.0, jnp.float32),
                              sr_bits(jnp.int32(8), (1000,)))
    assert np.all(np.asarray(g) == -5)


def test_int8_training_learns_and_tracks_f32():
    """Quality parity (loose — the int8 grid is coarse at tiny scales):
    the int8 run must LEARN (in-batch recall way above chance) and land
    near the f32 trajectory."""
    finals = {}
    for td in ("", "int8"):
        cfg = _cfg(td)
        group = 32 if td == "int8" else 8
        _, it = _batches(cfg, group)
        state = create_run_state(cfg, mb.init_params(cfg.tower, seed=0))
        metrics = []
        state = train(cfg, state, it, 150,
                      metrics_cb=lambda i, m: metrics.append(m))
        finals[td] = metrics[-1]
        # scale param must survive the step unchanged
        if td == "int8":
            assert state.params["shared"]["W0"].dtype == jnp.int8
            assert "W0_scale" in state.params["shared"]
    assert finals["int8"]["in_batch_recall@1"] > 0.5
    assert finals["int8"]["loss"] < finals[""]["loss"] * 1.5 + 0.5


def test_int8_scale_applied_in_cnn_lstm_lookup():
    """ADVICE r4 (medium): cnn/lstm table_lookup must dequantize against the
    per-row scale — raw int8 codes as embeddings are silently wrong. The
    int8 embed must equal running the same tower on a f32 table holding
    exactly q*scale."""
    for arch in ("cnn", "lstm"):
        cfg = validate(RunConfig(
            tower=TowerConfig(arch=arch, vocab_size=4096, embed_width=128,
                              conv_window=3, conv_channels=24, lstm_hidden=16,
                              semantic_dim=16, table_dtype="int8"),
            data=DataConfig(max_trigrams=32, max_words=8,
                            max_trigrams_per_word=6,
                            max_unique=1024, max_unique_rows=256),
            loss=LossConfig(mode="in_batch"),
            train=TrainConfig(batch_size=16, use_pallas=False),
        ))
        params = mb.init_params(cfg.tower, seed=0)
        key = mb.TABLE_KEY[arch]
        q8 = params["shared"][key]
        scale = params["shared"][f"{key}_scale"]
        f32p = {"shared": dict(params["shared"])}
        del f32p["shared"][f"{key}_scale"]
        f32p["shared"][key] = q8.astype(jnp.float32) * scale

        pairs = toy.make_toy_pairs(64, vocab_words=32, seed=3)
        hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
        rows = np.arange(16)
        batch8 = loader.select_batch(hashed, rows, True,
                                     cfg.data.max_unique, 32,
                                     cfg.data.max_unique_rows, True)
        batchf = loader.select_batch(hashed, rows, True,
                                     cfg.data.max_unique, 8,
                                     cfg.data.max_unique_rows, True)
        batch8 = {k: jnp.asarray(v) for k, v in batch8.items()}
        batchf = {k: jnp.asarray(v) for k, v in batchf.items()}
        e8 = mb.embed(params, cfg.tower, "q", batch8, impl="xla")
        ef = mb.embed(f32p, cfg.tower.replace(table_dtype=""), "q", batchf,
                      impl="xla")
        np.testing.assert_allclose(np.asarray(e8), np.asarray(ef),
                                   rtol=1e-5, atol=1e-6, err_msg=arch)


def test_u2_block_lane_alignment():
    """ADVICE r4: _u2_block must only return multiples of 128 — a
    non-power-of-two u2 (e.g. 384) must not yield a 192 block."""
    from dssm_tpu.kernels.pallas_count import _u2_block

    for u2 in (384, 640, 1152):
        for extra in (0, 1):
            got = _u2_block(u2, 384, 256, 4, extra)
            assert got is None or (got % 128 == 0 and u2 % got == 0), (u2, got)


def test_int8_validate_requirements():
    import pytest

    with pytest.raises(ValueError, match="table_optimizer"):
        validate(_cfg("int8").replace(
            train=_cfg("int8").train.replace(table_optimizer="adagrad")))


def test_int8_multi_step_scan():
    """K-steps-per-dispatch scan path with an int8 table (the bench path):
    the scale param must ride the scan carry unchanged."""
    from dssm_tpu.train.loop import make_multi_train_step, stack_batches

    cfg = _cfg("int8").replace(train=_cfg("int8").train.replace(
        steps_per_call=4))
    _, it = _batches(cfg, 32)
    state = create_run_state(cfg, mb.init_params(cfg.tower, seed=0))
    multi = make_multi_train_step(cfg, impl="xla")
    stacked = stack_batches(next(it) for _ in range(4))
    state, auxes = multi(state, stacked)
    assert np.all(np.isfinite(np.asarray(auxes["loss"])))
    assert state.params["shared"]["W0"].dtype == jnp.int8


def test_int8_parallel_dp_matches_single_device():
    """int8 table under the 8-device DP mesh: loss parity at step 1 (same
    initial params; SR scatter uses the same seed on every replica)."""
    from dssm_tpu.config import MeshConfig
    from dssm_tpu.parallel import mesh as mesh_lib
    from dssm_tpu.parallel.train_step import (
        create_sharded_state, make_parallel_train_step, shard_batch,
    )

    cfg = _cfg("int8").replace(mesh=MeshConfig(data_parallel=8,
                                               model_parallel=1))
    _, it = _batches(cfg, 32)
    batch = next(it)

    ref_state = create_run_state(cfg, mb.init_params(cfg.tower, seed=0))
    ref_step = make_train_step(cfg, impl="xla")
    ref_state, ref_aux = ref_step(ref_state, batch)

    mesh = mesh_lib.make_mesh(cfg.mesh)
    state = create_sharded_state(cfg, mesh, mb.init_params(cfg.tower, seed=0))
    with mesh:
        step = make_parallel_train_step(cfg, mesh, impl="xla")
        state, aux = step(state, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(aux["loss"]), float(ref_aux["loss"]),
                               rtol=1e-5)
    got = np.asarray(state.params["shared"]["W0"], np.int32)
    want = np.asarray(ref_state.params["shared"]["W0"], np.int32)
    np.testing.assert_array_equal(got, want)
