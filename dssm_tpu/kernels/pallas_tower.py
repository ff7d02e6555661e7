"""Pallas TPU kernel: fused dense tower — matmul + bias + tanh per layer,
L2-normalize at the end, one kernel launch for the whole tower.

Replaces the reference's chain of `tf.matmul` + activation ops (SURVEY.md
§3.1 row 3) and is the "fused matmul+tanh+L2-normalize Pallas kernel" named
by BASELINE.json:5. The tower dims (300-300-128) are far smaller than VMEM,
so all weights stay resident in VMEM across the whole batch; the grid tiles
the batch dimension only. Matmuls hit the MXU with f32 accumulation
(preferred_element_type), activations run on the VPU in f32, inter-layer
activations are cast back to the compute dtype.

Backward: the forward kernel also emits the per-layer activations and the
pre-normalization norm as residuals, so the custom VJP computes gradients
with plain (small) XLA matmuls — no forward recompute:

    dh_L   = (g - (g . yhat) yhat) / ||h_L||           (normalize VJP)
    dz_l   = dh_l * act'(z_l)      with act' from h_l  (tanh: 1 - h^2)
    dW_l   = h_{l-1}^T dz_l ; db_l = sum dz_l ; dh_{l-1} = dz_l W_l^T
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dssm_tpu.kernels.pallas_gather import interpret_forced
from dssm_tpu.kernels.tower import dense_tower_xla

_BATCH_TILE = 256


def _tower_kernel(num_layers, activation, normalize, eps, *refs):
    x_ref = refs[0]
    w_refs = refs[1 : 1 + num_layers]
    b_refs = refs[1 + num_layers : 1 + 2 * num_layers]
    out_refs = refs[1 + 2 * num_layers :]
    y_ref = out_refs[0]
    h_refs = out_refs[1 : 1 + num_layers]  # per-layer activations
    norm_ref = out_refs[1 + num_layers]  # [tile, 1] pre-normalize norms

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
        h_refs[l][:] = h32.astype(h_refs[l].dtype)
        # Feed the MXU its native dtype between layers; keep f32 on the last.
        h = h32.astype(x_ref.dtype) if l + 1 < num_layers else h32
    if normalize:
        norm = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True))
        norm = jnp.maximum(norm, eps)
        norm_ref[:] = norm
        h = h / norm
    else:
        norm_ref[:] = jnp.ones_like(norm_ref)
    y_ref[:] = h.astype(y_ref.dtype)


def _tower_forward(
    x: jax.Array,
    layers: Tuple[Tuple[jax.Array, jax.Array], ...],
    activation: str,
    normalize: bool,
):
    b = x.shape[0]
    num_layers = len(layers)
    tile = min(_BATCH_TILE, b)
    grid = (pl.cdiv(b, tile),)

    in_specs = [
        pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for w, _ in layers:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for _, bias in layers:
        in_specs.append(
            pl.BlockSpec(bias.shape, lambda i: (0,), memory_space=pltpu.VMEM)
        )

    dims = [w.shape[1] for w, _ in layers]
    out_shapes = [jax.ShapeDtypeStruct((b, dims[-1]), jnp.float32)]  # y
    out_specs = [pl.BlockSpec((tile, dims[-1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for d in dims:  # residual activations
        out_shapes.append(jax.ShapeDtypeStruct((b, d), jnp.float32))
        out_specs.append(
            pl.BlockSpec((tile, d), lambda i, _d=d: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    out_shapes.append(jax.ShapeDtypeStruct((b, 1), jnp.float32))  # norms
    out_specs.append(pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _tower_kernel, num_layers, activation, normalize, 1e-12
    )
    flops_per_row = sum(2 * w.shape[0] * w.shape[1] for w, _ in layers)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret_forced(),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_row,
            bytes_accessed=x.size * x.dtype.itemsize
            + sum(w.size * w.dtype.itemsize for w, _ in layers)
            + sum(b * d * 4 for d in dims),
            transcendentals=b * sum(dims),
        ),
    )(x, *[w for w, _ in layers], *[bias for _, bias in layers])
    y, hs, norms = outs[0], list(outs[1:-1]), outs[-1]
    return y, hs, norms


def _act_grad(h: jax.Array, activation: str) -> jax.Array:
    if activation == "tanh":
        return 1.0 - h * h
    if activation == "relu":
        return (h > 0.0).astype(h.dtype)
    raise ValueError(activation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _tower_op(x, flat_layers, activation, normalize):
    layers = tuple(zip(flat_layers[0::2], flat_layers[1::2]))
    y, _, _ = _tower_forward(x, layers, activation, normalize)
    return y


def _tower_fwd(x, flat_layers, activation, normalize):
    layers = tuple(zip(flat_layers[0::2], flat_layers[1::2]))
    y, hs, norms = _tower_forward(x, layers, activation, normalize)
    return y, (x, flat_layers, tuple(hs), norms, y)


def _tower_bwd(activation, normalize, residuals, g):
    x, flat_layers, hs, norms, y = residuals
    ws = flat_layers[0::2]
    num_layers = len(ws)
    g = g.astype(jnp.float32)
    if normalize:
        # y = h_L / norm; dh_L = (g - (g.y) y) / norm
        dh = (g - jnp.sum(g * y, axis=-1, keepdims=True) * y) / norms
    else:
        dh = g
    d_flat = [None] * (2 * num_layers)
    for l in reversed(range(num_layers)):
        h = hs[l]
        dz = dh * _act_grad(h, activation)
        h_prev = (x.astype(jnp.float32) if l == 0 else hs[l - 1])
        d_flat[2 * l] = jnp.dot(
            h_prev.T, dz, preferred_element_type=jnp.float32
        ).astype(ws[l].dtype)
        d_flat[2 * l + 1] = jnp.sum(dz, axis=0).astype(ws[l].dtype)
        dh = jnp.dot(dz, ws[l].T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return dh.astype(x.dtype), tuple(d_flat)


_tower_op.defvjp(_tower_fwd, _tower_bwd)


def dense_tower_pallas(
    x: jax.Array,
    layers: Sequence[Tuple[jax.Array, jax.Array]],
    activation: str = "tanh",
    normalize: bool = True,
) -> jax.Array:
    """Drop-in for dense_tower_xla with a fused Pallas forward and a
    residual-reusing analytic backward."""
    flat = []
    for w, bias in layers:
        flat.extend((w, bias))
    return _tower_op(x, tuple(flat), activation, normalize)
