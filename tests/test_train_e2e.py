"""End-to-end smoke: Tiny DSSM overfits the toy corpus on CPU
(SURVEY.md §5.3; BASELINE.json:7 requires CPU-runnable Tiny DSSM)."""

import numpy as np
import pytest

from dssm_tpu.config import (
    DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as model_base
from dssm_tpu.train.eval import evaluate, ranking_metrics
from dssm_tpu.train.loop import add_rotation_offsets, make_train_step, train
from dssm_tpu.train.state import create_state


def _small_cfg(arch="mlp", mode="in_batch"):
    return RunConfig(
        name="e2e",
        tower=TowerConfig(arch=arch, vocab_size=5000, embed_width=64,
                          hidden_dims=(48,), semantic_dim=32,
                          conv_channels=48, lstm_hidden=48),
        data=DataConfig(max_trigrams=48, max_words=8, max_trigrams_per_word=8),
        loss=LossConfig(mode=mode, num_negatives=8),
        train=TrainConfig(batch_size=64, learning_rate=0.1, max_steps=150,
                          use_pallas=False, log_every=1000),
    )


def _run(cfg, num_steps):
    pairs = toy.make_toy_pairs(256, vocab_words=128, seed=11)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_state(params, cfg.train)
    batches = loader.batch_iterator(
        hashed, cfg.train.batch_size, cfg.tower.is_sequence_model, seed=1
    )
    state = train(cfg, state, batches, num_steps)
    return state, hashed


def test_tiny_mlp_overfits_in_batch():
    cfg = _small_cfg("mlp", "in_batch")
    state, hashed = _run(cfg, 150)
    metrics = evaluate(state.params, cfg, hashed, batch_size=64)
    assert metrics["recall@1"] >= 0.8, metrics
    assert metrics["ndcg@10"] >= 0.85, metrics


def test_tiny_mlp_trains_rotate_mode():
    cfg = _small_cfg("mlp", "rotate")
    step_fn = make_train_step(cfg, impl="xla")
    pairs = toy.make_toy_pairs(128, vocab_words=128, seed=11)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_state(params, cfg.train)
    batches = loader.batch_iterator(hashed, cfg.train.batch_size, False, seed=1)
    losses = []
    for i in range(60):
        batch = add_rotation_offsets(next(batches), cfg, i)
        state, aux = step_fn(state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


@pytest.mark.parametrize("arch", ["cnn", "lstm"])
def test_sequence_models_learn(arch):
    cfg = _small_cfg(arch, "in_batch")
    state, hashed = _run(cfg, 120)
    metrics = evaluate(state.params, cfg, hashed, batch_size=64)
    assert metrics["recall@1"] >= 0.5, metrics


def test_compute_ranks_matches_numpy_oracle():
    """The d-chunked rank (r5) vs a dense numpy oracle, including ragged
    sizes that exercise the q-row and d-column padding + self-exclusion
    mask. Rows whose nearest competitor is within float noise of the true
    score are excluded from the comparison (ulp ties can break either way)."""
    from dssm_tpu.train.eval import compute_ranks

    rng = np.random.default_rng(7)
    for n in (64, 333, 1500):
        q = rng.standard_normal((n, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        d = (q + 0.4 * rng.standard_normal((n, 16)).astype(np.float32))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        s = q.astype(np.float64) @ d.astype(np.float64).T
        true_c = np.diag(s)
        self_mask = np.eye(n, dtype=bool)
        want = 1 + ((s > true_c[:, None]) & ~self_mask).sum(axis=1)
        got = np.asarray(compute_ranks(q, d))
        gap = np.min(np.abs(np.where(self_mask, np.inf, s)
                            - true_c[:, None]), axis=1)
        solid = gap > 1e-5
        assert solid.mean() > 0.9  # the test must actually compare rows
        np.testing.assert_array_equal(got[solid], want[solid])


def test_ranking_metrics_sanity():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20, 8))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    perfect = ranking_metrics(d, d)
    assert perfect["recall@1"] == 1.0 and perfect["ndcg@10"] == 1.0
    shuffled = ranking_metrics(d, np.roll(d, 5, axis=0))
    assert shuffled["recall@1"] < 0.2
