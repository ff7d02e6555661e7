"""shard_map global-negative-pool loss (loss/cosine_softmax.
in_batch_loss_sharded): the explicit all-gather + flash-style kernel path
must equal the single-array in_batch_loss in value AND gradients, with the
XLA inner loss and with the REAL Pallas kernel (interpret mode) under the
mesh — VERDICT round 1 items 4 and 5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.config import MeshConfig
from dssm_tpu.kernels.pallas_gather import force_interpret
from dssm_tpu.loss.cosine_softmax import (
    in_batch_loss,
    in_batch_loss_sharded,
    in_batch_loss_xla,
)
from dssm_tpu.parallel import mesh as mesh_lib

GAMMA = 20.0


def _unit_rows(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mesh(dp, mp=1):
    return mesh_lib.make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sharded_loss_matches_single_array(impl):
    # Shapes chosen to satisfy the Pallas loss tiling (b_local % 8 == 0,
    # B_global % 128 == 0) so impl="pallas" runs the real kernel, not the
    # fallback.
    b, d = 256, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(_unit_rows(rng, b, d))
    dm = jnp.asarray(_unit_rows(rng, b, d))
    ref_loss, ref_aux = jax.jit(
        lambda a, b_: in_batch_loss_xla(a, b_, GAMMA))(q, dm)

    mesh = _mesh(8)
    from contextlib import nullcontext

    ctx = force_interpret() if impl == "pallas" else nullcontext()
    with ctx, mesh:
        loss, aux = jax.jit(
            lambda a, b_: in_batch_loss_sharded(a, b_, GAMMA, mesh,
                                                impl=impl)
        )(q, dm)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for k in ref_aux:
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sharded_loss_grads_match(impl):
    b, d = 256, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(_unit_rows(rng, b, d))
    dm = jnp.asarray(_unit_rows(rng, b, d))

    g_ref = jax.grad(
        lambda a, b_: in_batch_loss_xla(a, b_, GAMMA)[0], argnums=(0, 1)
    )(q, dm)

    mesh = _mesh(8)
    from contextlib import nullcontext

    ctx = force_interpret() if impl == "pallas" else nullcontext()
    with ctx, mesh:
        g_sh = jax.jit(jax.grad(
            lambda a, b_: in_batch_loss_sharded(a, b_, GAMMA, mesh,
                                                impl=impl)[0],
            argnums=(0, 1),
        ))(q, dm)
    for got, want, name in zip(g_sh, g_ref, ("dq", "dd")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_sharded_loss_sum_shards_reduce():
    """reduce="sum_shards" (the contract-test escape, VERDICT r3 directive
    6): per-shard sums divided by B_global must equal the pmean result."""
    b, d = 128, 32
    rng = np.random.default_rng(3)
    q = jnp.asarray(_unit_rows(rng, b, d))
    dm = jnp.asarray(_unit_rows(rng, b, d))
    mesh = _mesh(8)
    with mesh:
        loss, aux = jax.jit(
            lambda a, b_: in_batch_loss_sharded(a, b_, GAMMA, mesh,
                                                impl="xla")
        )(q, dm)
        sums, aux_sums = jax.jit(
            lambda a, b_: in_batch_loss_sharded(a, b_, GAMMA, mesh,
                                                impl="xla",
                                                reduce="sum_shards")
        )(q, dm)
    assert sums.shape == (8,)
    np.testing.assert_allclose(float(jnp.sum(sums)) / b, float(loss),
                               rtol=1e-5)
    for k in aux:
        np.testing.assert_allclose(float(jnp.sum(aux_sums[k])) / b,
                                   float(aux[k]), rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_sharded_loss_local_negatives_mode():
    """global_pool=False: each shard scores only its local docs — the
    mesh.global_negatives=False configuration. Check against a per-shard
    numpy reference."""
    b, d, dp = 64, 32, 8
    rng = np.random.default_rng(2)
    q = _unit_rows(rng, b, d)
    dm = _unit_rows(rng, b, d)
    mesh = _mesh(dp)
    with mesh:
        loss, _ = jax.jit(
            lambda a, b_: in_batch_loss_sharded(a, b_, GAMMA, mesh,
                                                impl="xla",
                                                global_pool=False)
        )(jnp.asarray(q), jnp.asarray(dm))
    bl = b // dp
    per_shard = []
    for s in range(dp):
        ql, dl = q[s * bl:(s + 1) * bl], dm[s * bl:(s + 1) * bl]
        logits = GAMMA * ql @ dl.T
        lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) \
            + logits.max(1)
        per_shard.append(np.mean(lse - np.diag(logits)))
    np.testing.assert_allclose(float(loss), np.mean(per_shard), rtol=1e-5)


def test_global_pool_at_contract_scale():
    """Drive the negative pool at 8192 global negatives over 8 devices
    through the sparse SPMD step (the CPU-scaled stand-in for the 65k
    contract, BASELINE.json:11) and assert parity with single-device."""
    from dssm_tpu.config import (
        DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
    )
    from dssm_tpu.data import loader, toy
    from dssm_tpu.models import base as mb
    from dssm_tpu.parallel.train_step import (
        create_sharded_state, make_parallel_train_step, shard_batch,
    )
    from dssm_tpu.train.loop import make_train_step
    from dssm_tpu.train.state import create_state

    b = 8192
    cfg = RunConfig(
        tower=TowerConfig(vocab_size=8192, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=16, max_unique=4096,
                        max_unique_rows=2048, toy_num_pairs=b),
        loss=LossConfig(mode="in_batch"),
        mesh=MeshConfig(data_parallel=8, model_parallel=1),
        train=TrainConfig(batch_size=b, learning_rate=0.1, use_pallas=False),
    )
    pairs = toy.make_toy_pairs(b, vocab_words=512, seed=5)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    batch = loader.select_batch(
        hashed, np.arange(b), False,
        dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows,
    )

    ref_state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    ref_step = make_train_step(cfg, impl="xla")
    ref_state, ref_aux = ref_step(ref_state, batch)

    mesh = _mesh(8)
    state = create_sharded_state(cfg, mesh, mb.init_params(cfg.tower, seed=0))
    step = make_parallel_train_step(cfg, mesh, impl="xla")
    with mesh:
        state, aux = step(state, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(aux["loss"]), float(ref_aux["loss"]),
                               rtol=1e-5)
    # Every query saw the full 8192-doc pool: recall@1 metrics agree too.
    np.testing.assert_allclose(float(aux["in_batch_recall@1"]),
                               float(ref_aux["in_batch_recall@1"]),
                               rtol=1e-5, atol=1e-6)
