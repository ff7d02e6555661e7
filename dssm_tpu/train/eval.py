"""Retrieval evaluation: Recall@K and NDCG@K.

Reference: `accuracy` = fraction of rows where the positive out-ranks the NEG
sampled candidates (SURVEY.md §3.1 row 7 [R-high]). The parity metrics for
the build are Recall@1 and NDCG@10 over the full eval corpus (every query
ranked against every eval doc, true doc = aligned title) — BASELINE.json:2.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dssm_tpu.config import RunConfig
from dssm_tpu.data.loader import HashedPairs, eval_batches
from dssm_tpu.models import base as model_base


def embed_corpus(
    params,
    cfg: RunConfig,
    hashed: HashedPairs,
    batch_size: int = 256,
    impl: str = "xla",
):
    """Forward-only embed of the whole eval corpus -> (Q [N, D], Dm [N, D])."""

    @jax.jit
    def fwd(p, batch):
        return (
            model_base.embed(p, cfg.tower, "q", batch, impl=impl),
            model_base.embed(p, cfg.tower, "d", batch, impl=impl),
        )

    qs, ds = [], []
    for batch in eval_batches(hashed, batch_size, cfg.tower.is_sequence_model):
        q, d = fwd(params, batch)
        qs.append(np.asarray(q))
        ds.append(np.asarray(d))
    return np.concatenate(qs), np.concatenate(ds)


def ranking_metrics(q: np.ndarray, d: np.ndarray, ks=(1, 10)) -> Dict[str, float]:
    """q, d: [N, D] unit vectors; true doc for query i is d[i].

    rank_i = 1 + #docs scoring strictly higher than the true doc (ties break
    in the model's favor; with continuous embeddings exact ties are
    measure-zero).
    """
    n = q.shape[0]
    scores = q @ d.T  # [N, N]
    true_scores = np.diag(scores)
    ranks = 1 + (scores > true_scores[:, None]).sum(axis=1)  # [N]
    out: Dict[str, float] = {}
    for k in ks:
        out[f"recall@{k}"] = float((ranks <= k).mean())
    out["ndcg@10"] = float(np.where(ranks <= 10, 1.0 / np.log2(1 + ranks), 0.0).mean())
    out["mrr"] = float((1.0 / ranks).mean())
    out["num_queries"] = float(n)
    return out


def evaluate(
    params,
    cfg: RunConfig,
    hashed: HashedPairs,
    batch_size: int = 256,
    impl: str = "xla",
) -> Dict[str, float]:
    q, d = embed_corpus(params, cfg, hashed, batch_size, impl)
    return ranking_metrics(q, d)
