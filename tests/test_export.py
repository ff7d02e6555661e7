"""Serving path (dssm_tpu/serve + cli/export): train briefly, export the doc
index, retrieve — trained queries must recall their own clicked titles."""

import json
import subprocess
import sys

import numpy as np
import pytest

from dssm_tpu.config import (
    DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import hash_pairs, loader, make_toy_pairs
from dssm_tpu.models import base as mb
from dssm_tpu.serve import (
    build_doc_index, embed_queries, load_index, save_index, top_k,
)
from dssm_tpu.train.loop import train
from dssm_tpu.train.state import create_state

N = 256


def _cfg():
    return RunConfig(
        tower=TowerConfig(vocab_size=3000, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=2048,
                        max_unique_rows=512, toy_num_pairs=N,
                        toy_vocab_words=96),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=64, learning_rate=0.1, max_steps=150,
                          use_pallas=False),
    )


@pytest.fixture(scope="module")
def trained():
    cfg = _cfg()
    pairs = make_toy_pairs(N, vocab_words=96, seed=21)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)
    state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    batches = loader.batch_iterator(hashed, cfg.train.batch_size, False,
                                    seed=2)
    state = train(cfg, state, batches, cfg.train.max_steps)
    return cfg, state, pairs


def test_retrieval_recalls_clicked_titles(trained):
    cfg, state, pairs = trained
    titles = list(dict.fromkeys(pairs.titles))
    title_id = {t: i for i, t in enumerate(titles)}
    index = build_doc_index(state.params, cfg, titles, batch_size=64)
    assert index.shape == (len(titles), cfg.tower.semantic_dim)
    np.testing.assert_allclose(np.linalg.norm(index, axis=1), 1.0, rtol=1e-4)

    q_emb = embed_queries(state.params, cfg, pairs.queries, batch_size=64)
    scores, ids = top_k(q_emb, index, k=5)
    want = np.asarray([title_id[t] for t in pairs.titles])
    hit5 = float(np.mean([(want[i] in ids[i]) for i in range(len(want))]))
    assert hit5 >= 0.8, hit5
    # scores sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_top_k_empty_query_set():
    """ADVICE r4: zero queries must return empty [0, k] arrays, not divide
    by zero inside the scan chunking."""
    d = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    ss, ii = top_k(np.zeros((0, 8), np.float32), d, k=5)
    assert ss.shape == (0, 5) and ii.shape == (0, 5)
    assert ss.dtype == np.float32 and ii.dtype == np.int64


def test_top_k_approx_mode(trained):
    """exact=False routes through lax.approx_max_k (exact on the CPU
    backend, approximate-but-fast on TPU): well-formed output, near-total
    agreement with the exact path at small scale."""
    cfg, state, pairs = trained
    titles = list(dict.fromkeys(pairs.titles))
    index = build_doc_index(state.params, cfg, titles, batch_size=64)
    q_emb = embed_queries(state.params, cfg, pairs.queries[:100],
                          batch_size=64)
    se, ie = top_k(q_emb, index, k=5)
    sa, ia = top_k(q_emb, index, k=5, exact=False)
    assert sa.shape == se.shape and ia.shape == ie.shape
    assert float((ia == ie).mean()) > 0.9
    assert np.all(np.diff(sa, axis=1) <= 1e-6)  # descending


def test_index_roundtrip(tmp_path, trained):
    cfg, state, pairs = trained
    titles = list(dict.fromkeys(pairs.titles))[:32]
    emb = build_doc_index(state.params, cfg, titles, batch_size=64)
    path = str(tmp_path / "index.npz")
    save_index(path, emb, titles)
    emb2, titles2 = load_index(path)
    np.testing.assert_array_equal(emb, emb2)
    assert titles2 == titles


def test_export_cli_end_to_end(tmp_path):
    """Full CLI loop: train -> export index -> retrieve."""
    work = str(tmp_path / "run")
    common = [
        "--preset=tiny", "--cpu", f"--io.workdir={work}",
        "--data.toy_num_pairs=256", "--data.toy_vocab_words=96",
        "--data.max_unique=2048", "--data.max_unique_rows=512",
        "--tower.vocab_size=3000", "--tower.embed_width=32",
        "--tower.hidden_dims=24", "--tower.semantic_dim=16",
        "--train.batch_size=64",
    ]
    r = subprocess.run(
        [sys.executable, "-m", "dssm_tpu.cli.train", *common,
         "--train.max_steps=60", "--train.eval_every=0",
         "--train.checkpoint_every=0"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    index = str(tmp_path / "index.npz")
    r = subprocess.run(
        [sys.executable, "-m", "dssm_tpu.cli.export", *common,
         f"--out={index}"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["indexed_docs"] > 0

    r = subprocess.run(
        [sys.executable, "-m", "dssm_tpu.cli.export", *common,
         f"--index={index}", "--query=echo kilo alpha", "--k=3"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["query"] == "echo kilo alpha"
    assert len(out["results"]) == 3
    assert out["results"][0]["score"] >= out["results"][-1]["score"]
