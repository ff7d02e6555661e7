"""MLP-DSSM towers (configs 1-2: Tiny / Full DSSM, BASELINE.json:7-8).

Architecture (DSSM paper §3.1; SURVEY.md §3.1 row 3): bag-of-trigrams input
-> V x embed_width sparse first layer -> dense hidden layers -> semantic_dim,
activation at every layer, unit-norm output.

Initialization reuses the numpy oracle's init (uniform fan-in/fan-out from a
seeded numpy Generator) so the JAX model and the oracle start bit-identical —
that is what makes step-for-step training parity testable (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dssm_tpu.config import TowerConfig
from dssm_tpu.kernels.sparse_embed import embedding_bag
from dssm_tpu.kernels.tower import activate, dense_tower, l2_normalize
from dssm_tpu.oracle import numpy_oracle


def layer_dims(cfg: TowerConfig):
    return (cfg.embed_width, *cfg.hidden_dims, cfg.semantic_dim)


def init_tower(cfg: TowerConfig, seed: int = 0) -> Dict[str, jax.Array]:
    np_params = numpy_oracle.init_params(cfg.vocab_size, layer_dims(cfg), seed=seed)
    dtype = jnp.dtype(cfg.param_dtype)
    return {k: jnp.asarray(v, dtype=dtype) for k, v in np_params.items()}


def embed_tower(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    *,
    impl: str = "xla",
) -> jax.Array:
    idx, wgt = batch[f"{prefix}_idx"], batch[f"{prefix}_wgt"]
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    table = params["W0"].astype(compute_dtype)
    h = embedding_bag(table, idx, wgt, impl=impl)
    h = activate(h + params["b0"].astype(compute_dtype), cfg.activation)
    num_layers = len([k for k in params if k.startswith("W")])
    layers = [
        (params[f"W{l}"].astype(compute_dtype), params[f"b{l}"].astype(compute_dtype))
        for l in range(1, num_layers)
    ]
    if layers:
        y = dense_tower(h, layers, cfg.activation, normalize=False, impl=impl)
    else:
        y = h
    # Normalize in f32 for stable cosine geometry even under bf16 compute.
    return l2_normalize(y.astype(jnp.float32))
