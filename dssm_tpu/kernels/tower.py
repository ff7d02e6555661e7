"""Dense tower layers: matmul + bias + activation (+ final L2 normalize).

Reference mechanism: `tf.matmul` chains with relu in the L1/L2 name scopes
(SURVEY.md §3.1 row 3 [R-high]); the paper uses tanh. The build fuses the
whole dense tower — every matmul, bias, activation, and the output L2
normalization — into one Pallas kernel (the "fused matmul+tanh+L2-normalize"
kernel named by BASELINE.json:5), with this XLA composition as the fallback
and the ground truth for parity tests.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def activate(z: jax.Array, activation: str) -> jax.Array:
    if activation == "tanh":
        return jnp.tanh(z)
    if activation == "relu":
        return jnp.maximum(z, 0.0)
    raise ValueError(activation)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def dense_tower_xla(
    x: jax.Array,
    layers: Sequence[Tuple[jax.Array, jax.Array]],
    activation: str = "tanh",
    normalize: bool = True,
) -> jax.Array:
    """x [B, H0] -> activated dense layers -> unit-norm [B, D]."""
    h = x
    for w, b in layers:
        h = activate(jnp.dot(h, w, preferred_element_type=h.dtype) + b, activation)
    return l2_normalize(h) if normalize else h


def dense_tower(
    x: jax.Array,
    layers: Sequence[Tuple[jax.Array, jax.Array]],
    activation: str = "tanh",
    normalize: bool = True,
    *,
    impl: str = "auto",
) -> jax.Array:
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "xla":
        return dense_tower_xla(x, layers, activation, normalize)
    if impl == "pallas":
        from dssm_tpu.kernels.pallas_tower import dense_tower_pallas

        return dense_tower_pallas(x, layers, activation, normalize)
    raise ValueError(f"unknown impl {impl!r}")
