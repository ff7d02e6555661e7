"""Step-for-step parity: JAX Tiny DSSM vs the numpy reference-family oracle
(SURVEY.md §5.4). Same seed -> bit-identical init; forward, loss, gradients,
and multi-step SGD training must agree to f32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.config import LossConfig, RunConfig, TowerConfig, TrainConfig
from dssm_tpu.data import loader, toy, trigram
from dssm_tpu.loss.cosine_softmax import in_batch_loss_xla, rotate_loss
from dssm_tpu.models import base as model_base
from dssm_tpu.oracle import numpy_oracle as oracle
from dssm_tpu.train.loop import make_train_step
from dssm_tpu.train.state import create_state

V = 2000
EMB, HID, SEM = 32, (24,), 16
B = 16
SEED = 7


@pytest.fixture(scope="module")
def cfg():
    return RunConfig(
        name="parity",
        tower=TowerConfig(vocab_size=V, embed_width=EMB, hidden_dims=HID,
                          semantic_dim=SEM, activation="tanh",
                          shared_weights=True),
        loss=LossConfig(mode="rotate", num_negatives=4, gamma=20.0),
        train=TrainConfig(batch_size=B, learning_rate=0.1, optimizer="sgd",
                          use_pallas=False, seed=SEED),
    )


@pytest.fixture(scope="module")
def batch(cfg):
    pairs = toy.make_toy_pairs(B, vocab_words=64, seed=3)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    return loader.select_batch(hashed, np.arange(B), sequence=False)


def _dense(batch):
    x_q = trigram.dense_from_fixed(batch["q_idx"], batch["q_wgt"], V)
    x_d = trigram.dense_from_fixed(batch["d_idx"], batch["d_wgt"], V)
    return x_q.astype(np.float64), x_d.astype(np.float64)


def _oracle_params(jax_params):
    out = {k: np.asarray(v, dtype=np.float64)
           for k, v in jax_params["shared"].items()}
    out["W0"] = out["W0"][:, :EMB]  # drop lane-padding columns
    return out


def test_init_bit_identical(cfg):
    params = model_base.init_params(cfg.tower, seed=SEED)
    np_params = oracle.init_params(V, (EMB, *HID, SEM), seed=SEED)
    for k in np_params:
        got = np.asarray(params["shared"][k])
        if k == "W0":
            assert got.shape[1] % 128 == 0  # lane-padded storage
            assert (got[:, EMB:] == 0).all()
            got = got[:, :EMB]
        np.testing.assert_array_equal(got, np_params[k])


def test_forward_parity(cfg, batch):
    params = model_base.init_params(cfg.tower, seed=SEED)
    x_q, _ = _dense(batch)
    y_jax = np.asarray(model_base.embed(params, cfg.tower, "q", batch))
    y_np, _ = oracle.tower_forward(_oracle_params(params), x_q, "tanh")
    y_np = y_np / np.linalg.norm(y_np, axis=1, keepdims=True)
    np.testing.assert_allclose(y_jax, y_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(y_jax, axis=1), np.ones(B), rtol=1e-5
    )


def test_rotate_loss_parity(cfg, batch):
    params = model_base.init_params(cfg.tower, seed=SEED)
    x_q, x_d = _dense(batch)
    offsets = oracle.rotation_offsets(B, cfg.loss.num_negatives, SEED)

    op = _oracle_params(params)
    q_np, _ = oracle.tower_forward(op, x_q, "tanh")
    d_np, _ = oracle.tower_forward(op, x_d, "tanh")
    loss_np, _, _ = oracle.loss_rotate(q_np, d_np, offsets, cfg.loss.gamma)

    qh = model_base.embed(params, cfg.tower, "q", batch)
    dh = model_base.embed(params, cfg.tower, "d", batch)
    loss_jax, _ = rotate_loss(qh, dh, jnp.asarray(offsets), cfg.loss.gamma)
    assert abs(float(loss_jax) - loss_np) < 1e-5


def test_in_batch_loss_parity(cfg, batch):
    params = model_base.init_params(cfg.tower, seed=SEED)
    x_q, x_d = _dense(batch)
    op = _oracle_params(params)
    q_np, _ = oracle.tower_forward(op, x_q, "tanh")
    d_np, _ = oracle.tower_forward(op, x_d, "tanh")
    loss_np, _, _ = oracle.loss_in_batch(q_np, d_np, cfg.loss.gamma)

    qh = model_base.embed(params, cfg.tower, "q", batch)
    dh = model_base.embed(params, cfg.tower, "d", batch)
    loss_jax, aux = in_batch_loss_xla(qh, dh, cfg.loss.gamma)
    assert abs(float(loss_jax) - loss_np) < 1e-5
    assert 0.0 <= float(aux["in_batch_recall@1"]) <= 1.0


def test_grad_parity(cfg, batch):
    params = model_base.init_params(cfg.tower, seed=SEED)
    x_q, x_d = _dense(batch)
    offsets = oracle.rotation_offsets(B, cfg.loss.num_negatives, SEED)

    # Oracle gradients (shared weights: sum of both towers)
    op = _oracle_params(params)
    q_np, res_q = oracle.tower_forward(op, x_q, "tanh")
    d_np, res_d = oracle.tower_forward(op, x_d, "tanh")
    _, dq, dd = oracle.loss_rotate(q_np, d_np, offsets, cfg.loss.gamma)
    g_q = oracle.tower_backward(op, x_q, res_q, dq, "tanh")
    g_d = oracle.tower_backward(op, x_d, res_d, dd, "tanh")
    g_np = {k: g_q[k] + g_d[k] for k in g_q}

    def loss_fn(p):
        qh = model_base.embed(p, cfg.tower, "q", batch)
        dh = model_base.embed(p, cfg.tower, "d", batch)
        loss, _ = rotate_loss(qh, dh, jnp.asarray(offsets), cfg.loss.gamma)
        return loss

    g_jax = jax.grad(loss_fn)(params)["shared"]
    for k in g_np:
        got = np.asarray(g_jax[k])
        if k == "W0":
            assert (got[:, EMB:] == 0).all()  # padding columns get zero grad
            got = got[:, :EMB]
        np.testing.assert_allclose(got, g_np[k], rtol=1e-4, atol=1e-5, err_msg=k)


def test_training_parity_five_steps(cfg, batch):
    """Five full SGD steps: JAX jitted train step vs oracle, same batch."""
    params = model_base.init_params(cfg.tower, seed=SEED)
    state = create_state(params, cfg.train)
    step_fn = make_train_step(cfg, impl="xla")

    op = _oracle_params(params)
    x_q, x_d = _dense(batch)

    for step in range(5):
        offsets = oracle.rotation_offsets(B, cfg.loss.num_negatives, SEED + step)
        jb = dict(batch)
        jb["rot_offsets"] = jnp.asarray(offsets, dtype=jnp.int32)
        state, aux = step_fn(state, jb)
        op, loss_np = oracle.train_step(
            op, x_q, x_d, lr=cfg.train.learning_rate, gamma=cfg.loss.gamma,
            num_negatives=cfg.loss.num_negatives, activation="tanh",
            mode="rotate", rotation_seed=SEED + step,
        )
        assert abs(float(aux["loss"]) - loss_np) < 2e-4, (step, float(aux["loss"]), loss_np)

    # Params themselves stay close after 5 steps
    for k in op:
        got = np.asarray(state.params["shared"][k])
        if k == "W0":
            got = got[:, :EMB]
        np.testing.assert_allclose(got, op[k], rtol=1e-3, atol=1e-4, err_msg=k)
