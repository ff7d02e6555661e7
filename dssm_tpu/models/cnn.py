"""CNN-DSSM (CLSM) towers — config 3, BASELINE.json:9.

Mechanism (Shen et al., CIKM 2014 §3; SURVEY.md §3.1 row 10): a sliding
window of `conv_window` word-trigram vectors is projected to `conv_channels`
feature maps with tanh, max-pooled over time, then a dense semantic layer.

TPU-first formulation: the conv over sparse window-concatenated trigram
vectors is refactored into ONE weighted embedding-bag through a position-
blocked table [V, window*C] (each word is projected once for every window
position), followed by shifted adds — turning the sparse conv into the same
gather-accumulate kernel the MLP tower uses plus cheap VPU adds. This is
mathematically identical to conv(concat(f_{t-1}, f_t, f_{t+1}) @ Wc) because
the conv is linear in each window slot.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dssm_tpu.config import TowerConfig
from dssm_tpu.kernels.sparse_embed import embedding_bag
from dssm_tpu.kernels.tower import activate, l2_normalize


def init_tower(cfg: TowerConfig, seed: int = 0) -> Dict[str, jax.Array]:
    rng = np.random.default_rng(seed)
    v, w, c, d = cfg.vocab_size, cfg.conv_window, cfg.conv_channels, cfg.semantic_dim

    def uniform(nin, nout, shape):
        r = np.sqrt(6.0 / (nin + nout))
        return rng.uniform(-r, r, size=shape).astype(cfg.param_dtype)

    from dssm_tpu.models.base import pad_table_cols

    return {
        # Conv projection: window-blocked [V, w*C]; slot p holds the V->C map
        # applied to the word at window offset p. Lane-padded for DMA.
        "Wc": jnp.asarray(pad_table_cols(uniform(v * w, c, (v, w * c)))),
        "bc": jnp.asarray(uniform(v * w, c, (c,))),
        "Ws": jnp.asarray(uniform(c, d, (c, d))),
        "bs": jnp.asarray(uniform(c, d, (d,))),
    }


def table_lookup(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    *,
    impl: str = "xla",
) -> jax.Array:
    """Per-word window-blocked projection: [B, T, Kw] -> [B, T, window*C]."""
    from dssm_tpu.models.base import bag_lookup

    return bag_lookup(params["Wc"], cfg, batch, prefix, impl=impl,
                      scale=params.get("Wc_scale"))


def tower_from_lookup(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    lookup: jax.Array,
    *,
    impl: str = "xla",
) -> jax.Array:
    mask = batch[f"{prefix}_mask"]  # [B, T]
    b, t, _ = lookup.shape
    w, c = cfg.conv_window, cfg.conv_channels
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    feat = lookup[..., : w * c].reshape(b, t, w, c)  # drop lane padding
    # Window combine: h[:, t] = sum_p feat[:, t + p - w//2, p]. Padding words
    # have all-zero weights, so out-of-sentence slots contribute zeros.
    half = w // 2
    pad = jnp.zeros((b, half, w, c), dtype=feat.dtype)
    fp = jnp.concatenate([pad, feat, pad], axis=1)  # [B, T + 2*half, w, C]
    h = sum(fp[:, p : p + t, p, :] for p in range(w))
    h = activate(h + params["bc"].astype(compute_dtype), cfg.activation)
    # Masked max-pool over time (CLSM §3.3).
    neg = jnp.asarray(-1e9, dtype=h.dtype)
    h = jnp.where(mask[..., None] > 0, h, neg)
    pooled = jnp.max(h, axis=1)  # [B, C]
    y = activate(
        jnp.dot(pooled, params["Ws"].astype(compute_dtype),
                preferred_element_type=pooled.dtype)
        + params["bs"].astype(compute_dtype),
        cfg.activation,
    )
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
