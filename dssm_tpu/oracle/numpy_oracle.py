"""Numpy oracle of the reference-family DSSM training step.

The reference mount was empty (SURVEY.md §0), so parity is defined against
this first-party numpy implementation of the canonical reference math
(SURVEY.md §5.4): shared-weight MLP towers over dense bag-of-trigram vectors,
FD_rotate in-batch negatives, cosine similarity scaled by gamma, softmax
cross-entropy against candidate 0, plain SGD. Forward, analytic backward and
the SGD update are all hand-written numpy — no autodiff — so the JAX model is
validated against an independent derivation.

Everything is float64-capable for tight tolerances in tests.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

Params = Dict[str, np.ndarray]


def init_params(
    vocab_size: int,
    layer_dims: Sequence[int],
    seed: int = 0,
    dtype=np.float32,
) -> Params:
    """Uniform fan-in/fan-out init, the reference-family scheme:
    U(-sqrt(6/(nin+nout)), +sqrt(6/(nin+nout))) [R-high].

    layer_dims e.g. (300, 300, 128) builds V->300->300->128.
    """
    rng = np.random.default_rng(seed)
    dims = [vocab_size, *layer_dims]
    params: Params = {}
    for l in range(len(dims) - 1):
        nin, nout = dims[l], dims[l + 1]
        r = np.sqrt(6.0 / (nin + nout))
        params[f"W{l}"] = rng.uniform(-r, r, size=(nin, nout)).astype(dtype)
        params[f"b{l}"] = rng.uniform(-r, r, size=(nout,)).astype(dtype)
    return params


def _act(z: np.ndarray, activation: str) -> np.ndarray:
    if activation == "tanh":
        return np.tanh(z)
    if activation == "relu":
        return np.maximum(z, 0.0)
    raise ValueError(activation)


def _act_grad(z: np.ndarray, h: np.ndarray, activation: str) -> np.ndarray:
    if activation == "tanh":
        return 1.0 - h * h
    if activation == "relu":
        return (z > 0.0).astype(z.dtype)
    raise ValueError(activation)


def tower_forward(
    params: Params, x: np.ndarray, activation: str = "tanh"
) -> Tuple[np.ndarray, List[Tuple[np.ndarray, np.ndarray]]]:
    """x: dense [B, V]. Returns (y [B, D], residuals[(z_l, h_l)...])."""
    num_layers = len([k for k in params if k.startswith("W")])
    h = x
    residuals = []
    for l in range(num_layers):
        z = h @ params[f"W{l}"] + params[f"b{l}"]
        h = _act(z, activation)
        residuals.append((z, h))
    return h, residuals


def tower_backward(
    params: Params,
    x: np.ndarray,
    residuals: List[Tuple[np.ndarray, np.ndarray]],
    dy: np.ndarray,
    activation: str = "tanh",
) -> Params:
    """Gradients of a tower given upstream dy on its output."""
    num_layers = len(residuals)
    grads: Params = {}
    dh = dy
    for l in reversed(range(num_layers)):
        z, h = residuals[l]
        dz = dh * _act_grad(z, h, activation)
        h_prev = x if l == 0 else residuals[l - 1][1]
        grads[f"W{l}"] = h_prev.T @ dz
        grads[f"b{l}"] = dz.sum(axis=0)
        dh = dz @ params[f"W{l}"].T
    return grads


def rotation_offsets(batch_size: int, num_negatives: int, seed: int = 0) -> np.ndarray:
    """Deterministic stand-in for the reference's random rotation amounts
    (`FD_rotate`, SURVEY.md §3.1 row 4): NEG distinct offsets in [1, B)."""
    rng = np.random.default_rng(seed + 17)
    if num_negatives >= batch_size:
        raise ValueError("need num_negatives < batch_size")
    return rng.choice(np.arange(1, batch_size), size=num_negatives, replace=False)


def _cosine(q: np.ndarray, d: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Row-wise cosine between aligned [B, D] matrices."""
    qn = np.linalg.norm(q, axis=1)
    dn = np.linalg.norm(d, axis=1)
    return (q * d).sum(axis=1) / (qn * dn + eps)


def loss_rotate(
    q: np.ndarray, d: np.ndarray, offsets: np.ndarray, gamma: float
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Reference FD_rotate loss. Returns (loss, dq, dd).

    Candidates for query i: doc (i+r) % B for r in [0, *offsets].
    logits = gamma * cosine; p = softmax; loss = -mean log p[:, 0].
    """
    b = q.shape[0]
    rs = np.concatenate([[0], offsets]).astype(int)
    ncand = rs.shape[0]
    qn = np.linalg.norm(q, axis=1)  # [B]
    cos = np.zeros((b, ncand))
    for j, r in enumerate(rs):
        dd = np.roll(d, -r, axis=0)  # dd[i] = d[(i+r) % b]
        cos[:, j] = _cosine(q, dd)
    logits = gamma * cos
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    loss = float(-np.mean(np.log(p[:, 0] + 1e-30)))

    dlogits = p.copy()
    dlogits[:, 0] -= 1.0
    dlogits /= b
    dcos = gamma * dlogits  # [B, ncand]

    dq = np.zeros_like(q)
    dd_total = np.zeros_like(d)
    for j, r in enumerate(rs):
        dd = np.roll(d, -r, axis=0)
        ddn = np.linalg.norm(dd, axis=1)
        c = cos[:, j][:, None]
        g = dcos[:, j][:, None]
        dq += g * (dd / (qn[:, None] * ddn[:, None]) - c * q / (qn[:, None] ** 2))
        grad_dd = g * (q / (qn[:, None] * ddn[:, None]) - c * dd / (ddn[:, None] ** 2))
        dd_total += np.roll(grad_dd, r, axis=0)  # scatter back to original rows
    return loss, dq, dd_total


def loss_in_batch(
    q: np.ndarray, d: np.ndarray, gamma: float, labels: np.ndarray | None = None
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Full [B, B'] in-batch-negatives cosine softmax CE. Returns (loss, dq, dd).

    The build's primary loss (BASELINE.json:8): S = cos(q_i, d_j), positives on
    the (offset) diagonal given by `labels` (default arange(B)).
    """
    b = q.shape[0]
    if labels is None:
        labels = np.arange(b)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    dn = np.linalg.norm(d, axis=1, keepdims=True)
    qh = q / qn
    dh = d / dn
    s = qh @ dh.T  # [B, B']
    logits = gamma * s
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    loss = float(-np.mean(np.log(p[np.arange(b), labels] + 1e-30)))

    dlogits = p.copy()
    dlogits[np.arange(b), labels] -= 1.0
    dlogits /= b
    ds = gamma * dlogits  # [B, B']

    dqh = ds @ dh  # [B, D]
    ddh = ds.T @ qh  # [B', D]
    # Backprop through L2 normalization: d(x/|x|) = (I - xh xh^T)/|x|
    dq = (dqh - (dqh * qh).sum(axis=1, keepdims=True) * qh) / qn
    dd = (ddh - (ddh * dh).sum(axis=1, keepdims=True) * dh) / dn
    return loss, dq, dd


def train_step(
    params: Params,
    x_q: np.ndarray,
    x_d: np.ndarray,
    lr: float,
    gamma: float = 20.0,
    num_negatives: int = 50,
    activation: str = "tanh",
    mode: str = "rotate",
    rotation_seed: int = 0,
) -> Tuple[Params, float]:
    """One full reference-family SGD step on dense inputs. Returns (new_params, loss)."""
    q, res_q = tower_forward(params, x_q, activation)
    d, res_d = tower_forward(params, x_d, activation)
    if mode == "rotate":
        offsets = rotation_offsets(q.shape[0], num_negatives, rotation_seed)
        loss, dq, dd = loss_rotate(q, d, offsets, gamma)
    elif mode == "in_batch":
        loss, dq, dd = loss_in_batch(q, d, gamma)
    else:
        raise ValueError(mode)
    grads_q = tower_backward(params, x_q, res_q, dq, activation)
    grads_d = tower_backward(params, x_d, res_d, dd, activation)
    new_params = {
        k: params[k] - lr * (grads_q[k] + grads_d[k]) for k in params
    }
    return new_params, loss
