"""Two-tower model interface.

Every model family (MLP / CNN / LSTM — BASELINE.json:7-10) implements the same
functional contract, so the loss, parallelism, and kernels layers are shared
unchanged (SURVEY.md §8 M5):

    init_params(tower_cfg, seed)            -> params pytree
    embed(params, tower_cfg, side, batch)   -> [B, semantic_dim] unit vectors

`side` is "q" or "d". With shared_weights=True (the canonical reference
configuration, SURVEY.md §3.1 row 3) both sides read params["shared"];
otherwise params["query"] / params["doc"].
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from dssm_tpu.config import TowerConfig

Params = Dict[str, Any]


def tower_params(params: Params, side: str) -> Params:
    if "shared" in params:
        return params["shared"]
    return params["query" if side == "q" else "doc"]


def init_params(cfg: TowerConfig, seed: int = 0) -> Params:
    from dssm_tpu.models import cnn, lstm, mlp

    init_one = {
        "mlp": mlp.init_tower,
        "cnn": cnn.init_tower,
        "lstm": lstm.init_tower,
    }[cfg.arch]
    if cfg.shared_weights:
        params = {"shared": init_one(cfg, seed)}
    else:
        params = {"query": init_one(cfg, seed), "doc": init_one(cfg, seed + 1)}
    # The sparse first-layer table may use its own storage dtype (bf16 halves
    # gather/scatter DMA bytes; updates use stochastic rounding; int8
    # quarters them against a per-row f32 scale).
    if cfg.table_dtype_resolved == "int8":
        import jax.numpy as jnp

        key = TABLE_KEY[cfg.arch]
        out = {}
        for t, tp in params.items():
            w = tp[key].astype(jnp.float32)
            absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
            # Deterministic round-to-nearest at init; training updates use
            # stochastic rounding. Zero rows (e.g. lane padding never
            # written) get scale 0 and dequantize to exact zero.
            scale = absmax * (cfg.table_int8_headroom / 127.0)
            q = jnp.where(scale > 0, jnp.round(w / jnp.maximum(scale, 1e-30)),
                          0.0)
            q = jnp.clip(q, -127, 127).astype(jnp.int8)
            out[t] = {**{k: v for k, v in tp.items() if k != key},
                      key: q, f"{key}_scale": scale}
        return out
    if cfg.table_dtype_resolved != cfg.param_dtype:
        import jax.numpy as jnp

        td = jnp.dtype(cfg.table_dtype_resolved)
        key = TABLE_KEY[cfg.arch]
        params = {t: {k: (v.astype(td) if k == key else v)
                      for k, v in tp.items()}
                  for t, tp in params.items()}
    return params


def _arch_module(cfg: TowerConfig):
    from dssm_tpu.models import cnn, lstm, mlp

    return {"mlp": mlp, "cnn": cnn, "lstm": lstm}[cfg.arch]


def bag_lookup(
    table: jax.Array,
    cfg: TowerConfig,
    batch: Dict[str, jax.Array],
    prefix: str,
    impl: str = "xla",
    scale=None,
) -> jax.Array:
    """Shared first-layer lookup: the dedup compact-gather + count-matmul fast
    path when the loader provided {prefix}_uniq/{prefix}_inv, else the plain
    gather+weighted-sum bag. Output cast to the compute dtype."""
    import jax.numpy as jnp

    from dssm_tpu.kernels.dedup_embed import dedup_embedding_bag
    from dssm_tpu.kernels.sparse_embed import embedding_bag

    if "uniq" in batch or f"{prefix}_uniq" in batch:
        from dssm_tpu.kernels.pallas_gather import sublane_group

        joint = "uniq" in batch
        out = dedup_embedding_bag(
            table,
            batch["uniq"] if joint else batch[f"{prefix}_uniq"],
            batch[f"{prefix}_inv"],
            batch[f"{prefix}_wgt"],
            jnp.dtype(cfg.compute_dtype),
            group=sublane_group(table.dtype),
            impl=impl,
            row_sel=batch["sel"] if joint else batch.get(f"{prefix}_sel"),
            scale=scale,
        )
    else:
        out = embedding_bag(
            table, batch[f"{prefix}_idx"], batch[f"{prefix}_wgt"], impl=impl
        )
    return out.astype(jnp.dtype(cfg.compute_dtype))


# The single sparse first-layer table of each model family. Every other param
# is dense; these receive SPARSE gradient updates (train/sparse_update.py),
# matching the reference where sparse_tensor_dense_matmul yields
# tf.IndexedSlices and GradientDescentOptimizer applies row-wise updates.
TABLE_KEY = {"mlp": "W0", "cnn": "Wc", "lstm": "Win"}

LANE = 128  # TPU lane width: DMA-able tables need column counts % 128 == 0


def pad_table_cols(arr, lane: int = LANE):
    """Pad a [V, H] numpy table to H_pad = ceil(H/lane)*lane with zero columns.

    Mosaic HBM row DMAs require lane-aligned extents; the logical width is
    recovered by slicing the lookup output (tower_from_lookup). Padded columns
    are zero at init and receive exactly zero gradients, so they stay zero.
    """
    import numpy as np

    v, h = arr.shape
    pad = (-h) % lane
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((v, pad), dtype=arr.dtype)], axis=1)


def embed(
    params: Params,
    cfg: TowerConfig,
    side: str,
    batch: Dict[str, jax.Array],
    *,
    impl: str = "xla",
) -> jax.Array:
    """batch carries {side}_idx / {side}_wgt (+ {side}_mask for cnn/lstm)."""
    mod = _arch_module(cfg)
    tp = tower_params(params, side)
    prefix = "q" if side == "q" else "d"
    return mod.embed_tower(tp, cfg, batch, prefix, impl=impl)


def embed_table_lookup(
    params: Params,
    cfg: TowerConfig,
    side: str,
    batch: Dict[str, jax.Array],
    *,
    impl: str = "xla",
) -> jax.Array:
    """The first-layer embedding-bag only: gather+weighted-sum through the
    trigram table, BEFORE bias/activation. Split out so the sparse-update
    train step can treat its output as the differentiation boundary and
    scatter row-wise table updates instead of materializing dense grads."""
    mod = _arch_module(cfg)
    tp = tower_params(params, side)
    prefix = "q" if side == "q" else "d"
    return mod.table_lookup(tp, cfg, batch, prefix, impl=impl)


def embed_from_lookup(
    params: Params,
    cfg: TowerConfig,
    side: str,
    batch: Dict[str, jax.Array],
    lookup: jax.Array,
    *,
    impl: str = "xla",
) -> jax.Array:
    """Rest of the tower given the table lookup output; touches NO table."""
    mod = _arch_module(cfg)
    tp = tower_params(params, side)
    prefix = "q" if side == "q" else "d"
    return mod.tower_from_lookup(tp, cfg, batch, prefix, lookup, impl=impl)
