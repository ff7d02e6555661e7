"""EvalCache (VERDICT r5 item 1): the fixed eval corpus's host pipeline
(hash/dedupe/compress/stack) and device shipping are paid ONCE per run;
every later evaluate() call reuses the stacked blocks and pays only the
embed forward + rank."""

import jax.numpy as jnp
import numpy as np
import pytest

from dssm_tpu.config import (
    DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig, validate,
)
from dssm_tpu.data import hash_pairs, loader, make_toy_pairs
from dssm_tpu.models import base as mb
from dssm_tpu.train import eval as ev


def _cfg():
    return validate(RunConfig(
        tower=TowerConfig(vocab_size=3000, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=2048,
                        max_unique_rows=512),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=64, use_pallas=False),
    ))


@pytest.fixture()
def corpus():
    cfg = _cfg()
    pairs = make_toy_pairs(200, vocab_words=64, seed=11)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)
    params = mb.init_params(cfg.tower, seed=0)
    return cfg, hashed, params


def test_cached_eval_matches_uncached(corpus):
    cfg, hashed, params = corpus
    ev._EVAL_CACHES.clear()
    m_cold = ev.evaluate(params, cfg, hashed, 64, "xla", cache=False)
    m_hot1 = ev.evaluate(params, cfg, hashed, 64, "xla", cache=True)
    m_hot2 = ev.evaluate(params, cfg, hashed, 64, "xla", cache=True)
    for k in m_cold:
        assert m_cold[k] == m_hot1[k] == m_hot2[k], k


def test_cache_skips_host_pipeline(corpus, monkeypatch):
    """After the cache is built, evaluate must never re-enter the host batch
    pipeline — the whole point of the cache."""
    cfg, hashed, params = corpus
    ev._EVAL_CACHES.clear()
    m1 = ev.evaluate(params, cfg, hashed, 64, "xla", cache=True)

    def boom(*a, **k):
        raise AssertionError("host pipeline re-entered on a cached eval")

    monkeypatch.setattr(ev, "eval_batches", boom)
    m2 = ev.evaluate(params, cfg, hashed, 64, "xla", cache=True)
    assert m1 == m2
    with pytest.raises(AssertionError, match="re-entered"):
        ev.evaluate(params, cfg, hashed, 64, "xla", cache=False)


def test_cache_tracks_params_updates(corpus):
    """The cache holds BATCHES, not embeddings: metrics must change when
    params change (an eval during training sees the current model)."""
    cfg, hashed, params = corpus
    ev._EVAL_CACHES.clear()
    m1 = ev.evaluate(params, cfg, hashed, 64, "xla", cache=True)
    bumped = {t: {k: (v + 0.05 if k == "W0" else v) for k, v in tp.items()}
              for t, tp in params.items()}
    m2 = ev.evaluate(bumped, cfg, hashed, 64, "xla", cache=True)
    ref = ev.evaluate(bumped, cfg, hashed, 64, "xla", cache=False)
    assert m2 == ref
    assert any(m1[k] != m2[k] for k in ("recall@1", "ndcg@10", "mrr"))


def test_cache_keyed_on_corpus_and_batch_size(corpus):
    cfg, hashed, params = corpus
    ev._EVAL_CACHES.clear()
    ev.evaluate(params, cfg, hashed, 64, "xla", cache=True)
    assert len(ev._EVAL_CACHES) == 1
    # different batch size -> new entry
    ev.evaluate(params, cfg, hashed, 50, "xla", cache=True)
    assert len(ev._EVAL_CACHES) == 2
    # different corpus object -> new entry, same metrics as uncached
    pairs2 = make_toy_pairs(120, vocab_words=64, seed=12)
    hashed2 = hash_pairs(pairs2, cfg.tower, cfg.data)
    m = ev.evaluate(params, cfg, hashed2, 64, "xla", cache=True)
    ref = ev.evaluate(params, cfg, hashed2, 64, "xla", cache=False)
    assert m == ref
    assert len(ev._EVAL_CACHES) == 3
