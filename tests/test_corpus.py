"""File-backed corpus ingestion (data/corpus.py): readers, chunked hashing,
and the train-from-a-file e2e path (reference trains on real click-log packs,
SURVEY.md §3.1 row 2 / §4.3)."""

import json

import numpy as np
import pytest

from dssm_tpu.config import (
    DataConfig, LossConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import (
    hash_pairs,
    hash_pairs_chunked,
    load_file_corpus,
    loader,
    make_toy_pairs,
    read_pairs,
    write_tsv,
)
from dssm_tpu.models import base as model_base
from dssm_tpu.train.eval import evaluate
from dssm_tpu.train.loop import train
from dssm_tpu.train.state import create_state


def _cfg(path=""):
    return RunConfig(
        name="corpus-e2e",
        tower=TowerConfig(arch="mlp", vocab_size=5000, embed_width=64,
                          hidden_dims=(48,), semantic_dim=32),
        data=DataConfig(max_trigrams=48, path=path, eval_frac=0.2),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=64, learning_rate=0.1,
                          use_pallas=False, log_every=1000),
    )


def test_tsv_roundtrip(tmp_path):
    pairs = make_toy_pairs(64, vocab_words=64, seed=3)
    p = tmp_path / "corpus.tsv"
    write_tsv(pairs, str(p))
    back = read_pairs(str(p))
    assert back.queries == pairs.queries
    assert back.titles == pairs.titles


def test_tsv_skips_malformed_and_truncates(tmp_path):
    p = tmp_path / "corpus.tsv"
    p.write_text("q one\tt one\n\nno tab line\nq two\tt two\textra col\n")
    back = read_pairs(str(p))
    assert back.queries == ["q one", "q two"]
    assert back.titles == ["t one", "t two"]
    assert read_pairs(str(p), max_pairs=1).queries == ["q one"]


def test_jsonl_reader(tmp_path):
    p = tmp_path / "corpus.jsonl"
    rows = [
        {"query": "alpha beta", "title": "beta gamma"},
        {"query": "delta", "doc": "delta epsilon"},  # "doc" alias
        {"query": "skipme"},  # missing title -> skipped
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    back = read_pairs(str(p))
    assert back.queries == ["alpha beta", "delta"]
    assert back.titles == ["beta gamma", "delta epsilon"]


def test_unknown_extension_raises(tmp_path):
    p = tmp_path / "corpus.parquet"
    p.write_text("x")
    with pytest.raises(ValueError, match="unsupported corpus format"):
        read_pairs(str(p))


def test_chunked_hash_matches_one_shot():
    cfg = _cfg()
    pairs = make_toy_pairs(100, vocab_words=64, seed=5)
    one = hash_pairs(pairs, cfg.tower, cfg.data)
    chunked = hash_pairs_chunked(pairs, cfg.tower, cfg.data, chunk_size=17)
    for name in ("q_idx", "q_wgt", "d_idx", "d_wgt"):
        np.testing.assert_array_equal(getattr(one, name), getattr(chunked, name))


def test_train_from_file_e2e(tmp_path):
    """--data.path end-to-end: train from a TSV, eval on the held-out split."""
    p = tmp_path / "clicks.tsv"
    write_tsv(make_toy_pairs(400, vocab_words=96, seed=7), str(p))
    cfg = _cfg(path=str(p))
    hashed_train, hashed_eval, train_pairs, eval_pairs = load_file_corpus(
        cfg.tower, cfg.data)
    assert len(hashed_train) == 320 and len(hashed_eval) == 80
    # The split is a permutation (disjoint, covers everything) and is
    # deterministic across calls (multi-host contract).
    all_pairs = sorted(zip(train_pairs.queries + eval_pairs.queries,
                           train_pairs.titles + eval_pairs.titles))
    src = read_pairs(str(p))
    assert all_pairs == sorted(zip(src.queries, src.titles))
    h2 = load_file_corpus(cfg.tower, cfg.data)
    np.testing.assert_array_equal(hashed_train.q_idx, h2[0].q_idx)

    params = model_base.init_params(cfg.tower, seed=0)
    state = create_state(params, cfg.train)
    batches = loader.batch_iterator(hashed_train, cfg.train.batch_size,
                                    False, seed=1)
    state = train(cfg, state, batches, 150)
    metrics = evaluate(state.params, cfg, hashed_eval, batch_size=64)
    # Held-out eval on a learnable synthetic corpus: well above chance
    # (1/80 = 1.25% random recall@1).
    assert metrics["recall@1"] >= 0.5, metrics
    assert metrics["num_queries"] == 80


def test_pipelined_batch_iterator_bit_identical():
    """pipeline_workers>1 (threaded batch build with ordered reassembly)
    must produce the exact serial batch stream — both the global-dedupe
    multi-host branch and the simple per-shard branch."""
    import numpy as np

    from dssm_tpu.config import DataConfig, TowerConfig
    from dssm_tpu.data import loader, toy

    tower = TowerConfig(vocab_size=8192, embed_width=32, hidden_dims=(24,),
                        semantic_dim=16)
    data = DataConfig(max_trigrams=16)
    pairs = toy.make_toy_pairs(1024, vocab_words=128, seed=3)
    hashed = loader.hash_pairs(pairs, tower, data)
    for pc, pi in ((4, 1), (1, 0)):
        kw = dict(global_batch=256, sequence=False, seed=9,
                  process_index=pi, process_count=pc,
                  dedup_unique=1024, dedup_group=8, dedup_unique_rows=512,
                  dedup_joint=True, wire_compress=True, sort_rows=True)
        serial = loader.batch_iterator(hashed, **kw)
        piped = loader.batch_iterator(hashed, **kw, pipeline_workers=3)
        for _ in range(9):  # crosses an epoch boundary (4 batches/epoch)
            a, b = next(serial), next(piped)
            assert a.keys() == b.keys()
            for k in a:
                assert a[k].dtype == b[k].dtype, k
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_batch_iterator_start_batch_cursor():
    """Data cursor fast-forward (VERDICT r5 item 2): batch_iterator with
    start_batch=k yields exactly the stream a fresh iterator yields after k
    batches — mid-epoch and across the epoch boundary (a new permutation)."""
    cfg = _cfg()
    pairs = make_toy_pairs(200, vocab_words=48, seed=9)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)

    def take(start, count):
        it = loader.batch_iterator(hashed, 64, False, seed=4,
                                   start_batch=start)
        return [next(it) for _ in range(count)]

    # 200 pairs / 64 batch -> 3 batches per epoch
    full = take(0, 8)
    for start in (1, 3, 5):  # mid-epoch, exactly at boundary, epoch 2
        resumed = take(start, 8 - start)
        for a, b in zip(full[start:], resumed):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=(start, k))


def test_fixed_epoch_order_and_batch_cache(monkeypatch):
    """reshuffle_each_epoch=False replays the same stream every epoch;
    cache_epoch_batches memoizes the finished batches so the host pipeline
    (select + dedupe) runs exactly once per in-epoch batch index
    (VERDICT r5 item 4)."""
    cfg = _cfg()
    pairs = make_toy_pairs(192, vocab_words=48, seed=9)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)
    bpe = 192 // 64  # 3 batches per epoch

    def take(count, **kw):
        it = loader.batch_iterator(hashed, 64, False, seed=4,
                                   dedup_unique=512, dedup_joint=True, **kw)
        return [next(it) for _ in range(count)]

    # fixed order: epoch 2 == epoch 1
    fixed = take(2 * bpe, reshuffle_each_epoch=False)
    for a, b in zip(fixed[:bpe], fixed[bpe:]):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # default reshuffling: epoch 2 differs
    shuf = take(2 * bpe)
    assert any(not np.array_equal(shuf[i]["q_wgt"], shuf[bpe + i]["q_wgt"])
               for i in range(bpe))

    # cache: the expensive transform runs once per index across 3 epochs
    calls = []
    real = loader.select_batch

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(loader, "select_batch", counting)
    cached = take(3 * bpe, reshuffle_each_epoch=False,
                  cache_epoch_batches=True)
    assert len(calls) == bpe, len(calls)
    for e in (1, 2):
        for i in range(bpe):
            for k in cached[i]:
                np.testing.assert_array_equal(cached[i][k],
                                              cached[e * bpe + i][k])

    # config gate
    import pytest as _pytest

    from dssm_tpu.config import validate as _validate
    with _pytest.raises(ValueError, match="cache_epoch_batches"):
        _validate(cfg.replace(data=cfg.data.replace(
            cache_epoch_batches=True)))
