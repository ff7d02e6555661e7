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
    from dssm_tpu.models.base import pad_table_cols

    np_params = numpy_oracle.init_params(cfg.vocab_size, layer_dims(cfg), seed=seed)
    np_params["W0"] = pad_table_cols(np_params["W0"])  # lane-align for DMA
    dtype = jnp.dtype(cfg.param_dtype)
    return {k: jnp.asarray(v, dtype=dtype) for k, v in np_params.items()}


def table_lookup(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    *,
    impl: str = "xla",
) -> jax.Array:
    """First-layer embedding bag: [B, K] sparse text -> [B, embed_width].

    The table is gathered at its storage dtype and the (small) result is cast
    to the compute dtype — casting the whole 500k-row table per step would
    cost ~1 GB of HBM traffic.
    """
    from dssm_tpu.models.base import bag_lookup

    return bag_lookup(params["W0"], cfg, batch, prefix, impl=impl,
                      scale=params.get("W0_scale"))


def tower_from_lookup(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    lookup: jax.Array,
    *,
    impl: str = "xla",
) -> jax.Array:
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    lookup = lookup[..., : cfg.embed_width]  # drop lane-padding columns
    h = activate(lookup + params["b0"].astype(compute_dtype), cfg.activation)
    # Enumerate by key presence — `params` may be the dense subtree without W0
    # (sparse-update step), so counting W* keys would miscount.
    layers = []
    l = 1
    while f"W{l}" in params:
        layers.append(
            (params[f"W{l}"].astype(compute_dtype),
             params[f"b{l}"].astype(compute_dtype))
        )
        l += 1
    if layers:
        y = dense_tower(h.astype(compute_dtype), layers, cfg.activation,
                        normalize=False, impl=impl)
    else:
        y = h
    # Normalize in f32 for stable cosine geometry even under bf16 compute.
    return l2_normalize(y.astype(jnp.float32))


def embed_tower(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    *,
    impl: str = "xla",
) -> jax.Array:
    lookup = table_lookup(params, cfg, batch, prefix, impl=impl)
    return tower_from_lookup(params, cfg, batch, prefix, lookup, impl=impl)
