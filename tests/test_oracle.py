"""Validate the numpy oracle's hand-written backprop against finite
differences — the oracle is the parity ground truth (SURVEY.md §5.4), so its
own gradients must be independently verified."""

import numpy as np
import pytest

from dssm_tpu.oracle import numpy_oracle as oracle


def _numerical_grad(f, x, eps=1e-6):
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        orig = x[i]
        x[i] = orig + eps
        fp = f()
        x[i] = orig - eps
        fm = f()
        x[i] = orig
        g[i] = (fp - fm) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("mode", ["rotate", "in_batch"])
def test_loss_grads_match_finite_diff(mode):
    rng = np.random.default_rng(0)
    b, d = 6, 5
    q = rng.normal(size=(b, d)).astype(np.float64)
    dd = rng.normal(size=(b, d)).astype(np.float64)
    gamma = 20.0
    if mode == "rotate":
        offsets = oracle.rotation_offsets(b, 3, seed=0)
        loss, dq, ddd = oracle.loss_rotate(q, dd, offsets, gamma)
        f_q = lambda: oracle.loss_rotate(q, dd, offsets, gamma)[0]
        f_d = lambda: oracle.loss_rotate(q, dd, offsets, gamma)[0]
    else:
        loss, dq, ddd = oracle.loss_in_batch(q, dd, gamma)
        f_q = lambda: oracle.loss_in_batch(q, dd, gamma)[0]
        f_d = lambda: oracle.loss_in_batch(q, dd, gamma)[0]
    num_dq = _numerical_grad(f_q, q)
    num_dd = _numerical_grad(f_d, dd)
    np.testing.assert_allclose(dq, num_dq, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ddd, num_dd, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("activation", ["tanh", "relu"])
def test_tower_backward_matches_finite_diff(activation):
    rng = np.random.default_rng(1)
    v, dims, b = 20, (7, 4), 3
    params = oracle.init_params(v, dims, seed=0, dtype=np.float64)
    x = np.abs(rng.normal(size=(b, v)))  # counts-like input

    def scalar_loss():
        y, _ = oracle.tower_forward(params, x, activation)
        return float((y * y).sum() + y.sum())

    y, res = oracle.tower_forward(params, x, activation)
    dy = 2 * y + 1.0
    grads = oracle.tower_backward(params, x, res, dy, activation)
    for k in params:
        num = _numerical_grad(scalar_loss, params[k])
        np.testing.assert_allclose(grads[k], num, rtol=1e-5, atol=1e-7, err_msg=k)


def test_train_step_decreases_loss():
    rng = np.random.default_rng(2)
    v, dims, b = 50, (16, 8), 16
    params = oracle.init_params(v, dims, seed=0, dtype=np.float64)
    x_q = np.abs(rng.normal(size=(b, v)))
    x_d = x_q + 0.1 * np.abs(rng.normal(size=(b, v)))  # correlated positives
    losses = []
    for step in range(20):
        params, loss = oracle.train_step(
            params, x_q, x_d, lr=0.05, num_negatives=5, rotation_seed=step
        )
        losses.append(loss)
    assert losses[-1] < losses[0]


def test_rotation_offsets_deterministic_distinct():
    a = oracle.rotation_offsets(100, 50, seed=3)
    b = oracle.rotation_offsets(100, 50, seed=3)
    assert (a == b).all()
    assert len(set(a.tolist())) == 50
    assert (a >= 1).all() and (a < 100).all()
