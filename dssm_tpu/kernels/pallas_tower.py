"""Pallas TPU kernel: fused dense tower — matmul + bias + tanh per layer,
L2-normalize at the end, one kernel launch for the whole tower.

Replaces the reference's chain of `tf.matmul` + activation ops (SURVEY.md
§3.1 row 3) and is the "fused matmul+tanh+L2-normalize Pallas kernel" named
by BASELINE.json:5. The tower dims (300-300-128) are far smaller than VMEM,
so all weights stay resident in VMEM across the whole batch; the grid tiles
the batch dimension only. Matmuls hit the MXU with f32 accumulation
(preferred_element_type), activations run on the VPU in f32, inter-layer
activations are cast back to the compute dtype.

Backward: custom VJP that recomputes through the XLA composition
(kernels/tower.py) — forward-path fusion with autodiff-exact gradients.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dssm_tpu.kernels.tower import dense_tower_xla

_BATCH_TILE = 256


def _tower_kernel(num_layers, activation, normalize, eps, *refs):
    x_ref = refs[0]
    w_refs = refs[1 : 1 + num_layers]
    b_refs = refs[1 + num_layers : 1 + 2 * num_layers]
    out_ref = refs[1 + 2 * num_layers]

    h = x_ref[:]
    for l in range(num_layers):
        z = (
            jnp.dot(h, w_refs[l][:], preferred_element_type=jnp.float32)
            + b_refs[l][:].astype(jnp.float32)
        )
        if activation == "tanh":
            h32 = jnp.tanh(z)
        elif activation == "relu":
            h32 = jnp.maximum(z, 0.0)
        else:
            raise ValueError(activation)
        # Feed the MXU its native dtype between layers; keep f32 on the last.
        h = h32.astype(x_ref.dtype) if l + 1 < num_layers else h32
    if normalize:
        norm = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True))
        h = h / jnp.maximum(norm, eps)
    out_ref[:] = h.astype(out_ref.dtype)


def _tower_forward(
    x: jax.Array,
    layers: Tuple[Tuple[jax.Array, jax.Array], ...],
    activation: str,
    normalize: bool,
) -> jax.Array:
    b = x.shape[0]
    num_layers = len(layers)
    out_dim = layers[-1][0].shape[1]
    tile = min(_BATCH_TILE, b)
    grid = (pl.cdiv(b, tile),)

    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    # Weights/biases: whole-array blocks, same for every grid step.
    for w, _ in layers:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for _, bias in layers:
        in_specs.append(
            pl.BlockSpec(bias.shape, lambda i: (0,), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _tower_kernel, num_layers, activation, normalize, 1e-12
    )
    flops_per_row = sum(2 * w.shape[0] * w.shape[1] for w, _ in layers)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_row,
            bytes_accessed=x.size * x.dtype.itemsize
            + sum(w.size * w.dtype.itemsize for w, _ in layers)
            + b * out_dim * 4,
            transcendentals=b * sum(w.shape[1] for w, _ in layers),
        ),
    )(x, *[w for w, _ in layers], *[bias for _, bias in layers])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _tower_op(x, flat_layers, activation, normalize):
    layers = tuple(zip(flat_layers[0::2], flat_layers[1::2]))
    return _tower_forward(x, layers, activation, normalize)


def _tower_fwd(x, flat_layers, activation, normalize):
    return _tower_op(x, flat_layers, activation, normalize), (x, flat_layers)


def _tower_bwd(activation, normalize, residuals, g):
    x, flat_layers = residuals

    def ref_fn(x, flat):
        layers = tuple(zip(flat[0::2], flat[1::2]))
        return dense_tower_xla(x, layers, activation, normalize).astype(
            jnp.float32
        )

    _, vjp = jax.vjp(ref_fn, x, flat_layers)
    return vjp(g)


_tower_op.defvjp(_tower_fwd, _tower_bwd)


def dense_tower_pallas(
    x: jax.Array,
    layers: Sequence[Tuple[jax.Array, jax.Array]],
    activation: str = "tanh",
    normalize: bool = True,
) -> jax.Array:
    """Drop-in for dense_tower_xla with a fused Pallas forward."""
    flat = []
    for w, bias in layers:
        flat.extend((w, bias))
    return _tower_op(x, tuple(flat), activation, normalize)
