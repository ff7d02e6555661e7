"""Faked multi-device tests (8 virtual CPU devices, SURVEY.md §5.3):
DP sharding, the all-gather global negative pool, and the vocab-sharded
embedding table must reproduce the single-device run at fixed seed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dssm_tpu.config import (
    DataConfig, LossConfig, MeshConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import loader, toy
from dssm_tpu.kernels.sharded_embed import embedding_bag_sharded
from dssm_tpu.kernels.sparse_embed import embedding_bag_xla
from dssm_tpu.models import base as model_base
from dssm_tpu.parallel import mesh as mesh_lib
from dssm_tpu.parallel.train_step import (
    create_sharded_state,
    make_parallel_train_step,
    shard_batch,
)
from dssm_tpu.train.loop import make_train_step
from dssm_tpu.train.state import create_state

B = 64


def _cfg(dp=-1, mp=1, vocab=4096):
    return RunConfig(
        name="par",
        tower=TowerConfig(vocab_size=vocab, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32),
        loss=LossConfig(mode="in_batch", gamma=20.0),
        mesh=MeshConfig(data_parallel=dp, model_parallel=mp),
        train=TrainConfig(batch_size=B, learning_rate=0.1, use_pallas=False),
    )


def _batch(cfg):
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=9)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    return loader.select_batch(hashed, np.arange(B), sequence=False)


def _single_device_run(cfg, batch, steps=3):
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_state(params, cfg.train)
    step_fn = make_train_step(cfg, impl="xla")
    losses = []
    for _ in range(steps):
        state, aux = step_fn(state, batch)
        losses.append(float(aux["loss"]))
    return state, losses


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2), (2, 4)])
def test_parallel_matches_single_device(dp, mp):
    cfg = _cfg(dp, mp)
    batch = _batch(cfg)
    _, ref_losses = _single_device_run(cfg, batch, steps=3)

    mesh = mesh_lib.make_mesh(cfg.mesh)
    assert mesh.shape == {"data": dp, "model": mp}
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_sharded_state(cfg, mesh, params)
    step_fn = make_parallel_train_step(cfg, mesh, impl="xla")
    sbatch = shard_batch(batch, mesh)
    losses = []
    with mesh:
        for _ in range(3):
            state, aux = step_fn(state, sbatch)
            losses.append(float(aux["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)


def test_vocab_sharded_table_layout_preserved():
    cfg = _cfg(4, 2)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_sharded_state(cfg, mesh, params)
    spec = state.params["shared"]["W0"].sharding.spec
    assert len(spec) >= 1 and spec[0] == "model", spec
    step_fn = make_parallel_train_step(cfg, mesh, impl="xla")
    batch = shard_batch(_batch(cfg), mesh)
    with mesh:
        state, _ = step_fn(state, batch)
    # Update must not de-shard the table (trailing Nones normalize away)
    spec_after = state.params["shared"]["W0"].sharding.spec
    assert len(spec_after) >= 1 and spec_after[0] == "model", spec_after
    # Dense layers replicated
    w1_spec = state.params["shared"]["W1"].sharding.spec
    assert all(s is None for s in w1_spec), w1_spec


def test_sharded_embedding_bag_matches_dense():
    cfg = _cfg(4, 2, vocab=64)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    rng = np.random.default_rng(0)
    table = rng.normal(size=(64, 16)).astype(np.float32)
    idx = rng.integers(0, 64, size=(8, 5)).astype(np.int32)
    wgt = rng.uniform(0, 2, size=(8, 5)).astype(np.float32)
    ref = embedding_bag_xla(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(wgt))
    with mesh:
        t = jax.device_put(table, NamedSharding(mesh, P("model", None)))
        out = embedding_bag_sharded(
            t, jnp.asarray(idx), jnp.asarray(wgt), mesh
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sharded_embedding_grads_match():
    cfg = _cfg(4, 2, vocab=64)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    rng = np.random.default_rng(1)
    table = rng.normal(size=(64, 16)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, 64, size=(8, 5)).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0, 2, size=(8, 5)).astype(np.float32))

    g_ref = jax.grad(lambda t: embedding_bag_xla(t, idx, wgt).sum())(
        jnp.asarray(table)
    )
    with mesh:
        t = jax.device_put(table, NamedSharding(mesh, P("model", None)))
        g_sh = jax.grad(
            lambda t: embedding_bag_sharded(t, idx, wgt, mesh).sum()
        )(t)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_hlo_contains_global_negative_pool_collectives():
    """The compiled step must contain the doc-embedding all-gather over
    'data' ([B_local, D] -> [B_global, D]) AND its reduce-scatter transpose
    in the backward ([B_global, D] -> [B_local, D]) — SURVEY.md §8 hard
    part 1, matched on operand shapes, not just substrings."""
    import re

    cfg = _cfg(8, 1)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_sharded_state(cfg, mesh, params)
    step_fn = make_parallel_train_step(cfg, mesh, impl="xla")
    batch = shard_batch(_batch(cfg), mesh)
    with mesh:
        lowered = jax.jit(step_fn).lower(state, batch)
        compiled = lowered.compile()
    txt = compiled.as_text()
    d = cfg.tower.semantic_dim
    b_global, b_local = B, B // 8
    # fwd: the gathered doc pool [B_global, D] comes out of an all-gather
    ag = re.search(rf"f32\[{b_global},{d}\]\S*\s+all-gather\(", txt)
    assert ag, f"doc-pool all-gather [{b_global},{d}] missing:\n" + txt[:3000]
    # bwd: its transpose reduce-scatters grads back to [B_local, D]
    rs = re.search(rf"f32\[{b_local},{d}\]\S*\s+reduce-scatter\(", txt)
    assert rs, f"grad reduce-scatter [{b_local},{d}] missing:\n" + txt[:3000]


def test_mesh_validation():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(MeshConfig(data_parallel=3, model_parallel=2))
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(MeshConfig(data_parallel=-1, model_parallel=3))
