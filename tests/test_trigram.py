"""Unit tests for letter-trigram word hashing (SURVEY.md §5.2)."""

import numpy as np

from dssm_tpu.data import trigram


def test_word_trigrams_golden():
    assert trigram.word_trigrams("good") == ["#go", "goo", "ood", "od#"]
    assert trigram.word_trigrams("a") == ["#a#"]
    assert trigram.word_trigrams("ab") == ["#ab", "ab#"]


def test_tokenize():
    assert trigram.tokenize("Hello, World!  foo's") == ["hello", "world", "foo's"]


def test_trigram_id_range_and_determinism():
    v = 30_000
    ids = [trigram.trigram_id(t, v) for t in ["#go", "goo", "ood", "od#", "#a#"]]
    assert all(1 <= i < v for i in ids)
    assert ids == [trigram.trigram_id(t, v) for t in ["#go", "goo", "ood", "od#", "#a#"]]


def test_pad_index_reserved():
    idx, wgt = trigram.hash_text("good query text", 30_000, 64)
    nz = wgt > 0
    assert (idx[nz] != trigram.PAD_INDEX).all()
    assert (wgt[~nz] == 0).all()
    assert (idx[~nz] == trigram.PAD_INDEX).all()


def test_counts_roundtrip_dense():
    v = 10_000
    texts = ["good good query", "other title words"]
    idx, wgt = trigram.hash_batch(texts, v, 64)
    dense = trigram.dense_from_fixed(idx, wgt, v)
    for b, text in enumerate(texts):
        counts = trigram.text_trigram_counts(text, v)
        for i, c in counts.items():
            assert dense[b, i] == c
        assert dense[b].sum() == sum(counts.values())


def test_repeated_word_doubles_counts():
    v = 10_000
    c1 = trigram.text_trigram_counts("good", v)
    c2 = trigram.text_trigram_counts("good good", v)
    assert c2 == {k: 2 * val for k, val in c1.items()}


def test_truncation_keeps_heaviest():
    v = 10_000
    # 'aaa aaa aaa bb' -> trigrams of 'aaa' have count 3, should survive k=2
    idx, wgt = trigram.hash_text("aaa aaa aaa bb", v, 2)
    assert (wgt == 3.0).all()


def test_sequence_hashing_shapes_and_mask():
    v = 10_000
    idx, wgt, mask = trigram.hash_text_sequence("two words", v, 4, 8)
    assert idx.shape == (4, 8) and wgt.shape == (4, 8) and mask.shape == (4,)
    assert mask.tolist() == [1.0, 1.0, 0.0, 0.0]
    assert (wgt[2:] == 0).all()
    # word rows beyond K trigrams are truncated but real rows are populated
    assert wgt[0].sum() > 0 and wgt[1].sum() > 0


def test_sequence_truncates_long_text():
    v = 10_000
    text = " ".join(["word"] * 10)
    idx, wgt, mask = trigram.hash_text_sequence(text, v, 4, 8)
    assert mask.sum() == 4


def test_collision_rate_low_on_toy_corpus():
    from dssm_tpu.data.toy import make_toy_pairs

    pairs = make_toy_pairs(256, vocab_words=256, seed=0)
    stats = trigram.collision_stats(pairs.queries + pairs.titles, 30_000)
    assert stats["collision_rate"] < 0.05, stats


def test_normalize_counts():
    idx, wgt = trigram.hash_text("good query", 30_000, 64, normalize=True)
    assert abs(np.linalg.norm(wgt) - 1.0) < 1e-6
