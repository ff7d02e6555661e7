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
        return {"shared": init_one(cfg, seed)}
    return {"query": init_one(cfg, seed), "doc": init_one(cfg, seed + 1)}


def embed(
    params: Params,
    cfg: TowerConfig,
    side: str,
    batch: Dict[str, jax.Array],
    *,
    impl: str = "xla",
) -> jax.Array:
    """batch carries {side}_idx / {side}_wgt (+ {side}_mask for cnn/lstm)."""
    from dssm_tpu.models import cnn, lstm, mlp

    embed_one = {
        "mlp": mlp.embed_tower,
        "cnn": cnn.embed_tower,
        "lstm": lstm.embed_tower,
    }[cfg.arch]
    tp = tower_params(params, side)
    prefix = "q" if side == "q" else "d"
    return embed_one(tp, cfg, batch, prefix, impl=impl)
