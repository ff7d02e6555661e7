"""LSTM-DSSM towers — config 4, BASELINE.json:10.

Mechanism (Palangi et al., TASLP 2016 §III; SURVEY.md §3.1 row 11): an LSTM
reads the word sequence (each word a letter-trigram bag); the hidden state at
the last real word is the sentence embedding.

TPU-first formulation: per-word trigram vectors are projected by the shared
embedding-bag kernel, then a single fused `lax.scan` runs the recurrence
time-major on-chip — sequences are short (queries/titles, T<=~32), so scan
per-chip is the right tool rather than any sequence parallelism
(SURVEY.md §3.3). Padding steps carry the state through unchanged, so the
final carry equals the state at each row's last real word.
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
    v, e, h, d = cfg.vocab_size, cfg.embed_width, cfg.lstm_hidden, cfg.semantic_dim

    def uniform(nin, nout, shape):
        r = np.sqrt(6.0 / (nin + nout))
        return rng.uniform(-r, r, size=shape).astype(cfg.param_dtype)

    from dssm_tpu.models.base import pad_table_cols

    return {
        "Win": jnp.asarray(pad_table_cols(uniform(v, e, (v, e)))),
        "bin": jnp.asarray(uniform(v, e, (e,))),
        "Wx": jnp.asarray(uniform(e, 4 * h, (e, 4 * h))),
        "Wh": jnp.asarray(uniform(h, 4 * h, (h, 4 * h))),
        "bh": jnp.asarray(np.zeros((4 * h,), dtype=cfg.param_dtype)),
        "Ws": jnp.asarray(uniform(h, d, (h, d))),
        "bs": jnp.asarray(uniform(h, d, (d,))),
    }


def table_lookup(
    params: Dict[str, jax.Array],
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    *,
    impl: str = "xla",
) -> jax.Array:
    """Per-word trigram projection: [B, T, Kw] -> [B, T, embed_width]."""
    from dssm_tpu.models.base import bag_lookup

    return bag_lookup(params["Win"], cfg, batch, prefix, impl=impl,
                      scale=params.get("Win_scale"))


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
    hdim = cfg.lstm_hidden
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    lookup = lookup[..., : cfg.embed_width]  # drop lane-padding columns
    x = activate(lookup + params["bin"].astype(compute_dtype), cfg.activation)  # [B, T, E]

    wx = params["Wx"].astype(compute_dtype)
    wh = params["Wh"].astype(compute_dtype)
    bh = params["bh"].astype(compute_dtype)

    # Precompute all input projections in one big MXU matmul: [B*T, 4H].
    xp = jnp.dot(x.reshape(b * t, -1), wx, preferred_element_type=compute_dtype)
    xp = xp.reshape(b, t, 4 * hdim).transpose(1, 0, 2)  # time-major [T, B, 4H]
    mask_t = mask.T[..., None].astype(compute_dtype)  # [T, B, 1]

    def cell(carry, inputs):
        h_prev, c_prev = carry
        xproj, m = inputs
        gates = xproj + jnp.dot(h_prev, wh, preferred_element_type=compute_dtype) + bh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        # Padding steps (m=0) carry state through -> final carry is the state
        # at each row's last real word.
        h_out = m * h_new + (1 - m) * h_prev
        c_out = m * c_new + (1 - m) * c_prev
        return (h_out, c_out), None

    h0 = jnp.zeros((b, hdim), dtype=compute_dtype)
    c0 = jnp.zeros((b, hdim), dtype=compute_dtype)
    (h_final, _), _ = jax.lax.scan(cell, (h0, c0), (xp, mask_t))

    y = activate(
        jnp.dot(h_final, params["Ws"].astype(compute_dtype),
                preferred_element_type=compute_dtype)
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
