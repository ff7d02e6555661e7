"""C++ data-plane (native/dssm_native.cpp) must be bit-exact with the Python
trigram hashing, and meaningfully faster."""

import os
import time

import numpy as np
import pytest

from dssm_tpu.data import native, trigram
from dssm_tpu.data.toy import make_toy_pairs


@pytest.fixture(scope="module")
def mod():
    m = native.get_module()
    if m is None:
        pytest.skip("native toolchain unavailable")
    return m


def _python_hash_batch(texts, v, k, normalize=False):
    n = len(texts)
    idx = np.full((n, k), 0, dtype=np.int32)
    wgt = np.zeros((n, k), dtype=np.float32)
    for b, text in enumerate(texts):
        idx[b], wgt[b] = trigram.hash_text(text, v, k, normalize)
    return idx, wgt


def _python_hash_seq(texts, v, t, kw, normalize=False):
    n = len(texts)
    idx = np.full((n, t, kw), 0, dtype=np.int32)
    wgt = np.zeros((n, t, kw), dtype=np.float32)
    mask = np.zeros((n, t), dtype=np.float32)
    for b, text in enumerate(texts):
        idx[b], wgt[b], mask[b] = trigram.hash_text_sequence(text, v, t, kw,
                                                             normalize)
    return idx, wgt, mask


@pytest.mark.parametrize("normalize", [False, True])
def test_hash_batch_bit_exact(mod, normalize):
    pairs = make_toy_pairs(128, vocab_words=64, seed=0)
    texts = pairs.queries + pairs.titles + [
        "", "A", "MiXeD CaSe!!", "it's a don't-stop 123 test",
        "word " * 50,  # truncation path
        "élève café",  # non-ascii: regex drops accents
    ]
    v, k = 30_000, 32
    nat = native.hash_batch(texts, v, k, normalize)
    ref = _python_hash_batch(texts, v, k, normalize)
    np.testing.assert_array_equal(nat[0], ref[0])
    np.testing.assert_allclose(nat[1], ref[1], rtol=1e-6)


def test_hash_batch_sequence_bit_exact(mod):
    pairs = make_toy_pairs(64, vocab_words=64, seed=1)
    texts = pairs.titles + ["", "one", "exactly four words here now extra"]
    v, t, kw = 30_000, 6, 8
    nat = native.hash_batch_sequence(texts, v, t, kw)
    ref = _python_hash_seq(texts, v, t, kw)
    np.testing.assert_array_equal(nat[0], ref[0])
    np.testing.assert_allclose(nat[1], ref[1], rtol=1e-6)
    np.testing.assert_array_equal(nat[2], ref[2])


def test_native_is_faster(mod):
    pairs = make_toy_pairs(512, vocab_words=256, seed=2)
    texts = pairs.titles
    v, k = 30_000, 48
    t0 = time.perf_counter()
    native.hash_batch(texts, v, k, False)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _python_hash_batch(texts, v, k, False)
    t_py = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)


@pytest.mark.parametrize(
    "n,k,g_cap_rows,u2_cap,group,vmax",
    [
        (256, 16, 512, 256, 8, 30_000),     # no overflow
        (256, 16, 64, 32, 8, 30_000),       # both levels overflow
        (128, 8, 128, 8, 8, 500),           # dense collisions, row overflow
        (64, 4, 64, 64, 16, 30_000),        # bf16-style 16-row groups
        (512, 32, 256, 64, 8, 200),         # heavy duplication, group overflow
    ],
)
def test_dedupe_two_level_bit_exact(mod, n, k, g_cap_rows, u2_cap, group,
                                    vmax):
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level_numpy

    rng = np.random.default_rng(hash((n, k, g_cap_rows, u2_cap)) % 2**31)
    idx = rng.integers(0, vmax, size=(n, k), dtype=np.int32)
    nat = native.dedupe_two_level(idx, g_cap_rows, u2_cap, group)
    assert nat is not None
    ref = dedupe_two_level_numpy(idx, g_cap_rows, u2_cap, group)
    for name, a, b in zip(("uniq", "row_sel", "inv2", "keep"), nat, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_dedupe_native_is_faster(mod):
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level_numpy

    rng = np.random.default_rng(0)
    idx = rng.integers(0, 500_000, size=(8192, 64), dtype=np.int32)
    t0 = time.perf_counter()
    native.dedupe_two_level(idx, 16384, 8192, 8)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    dedupe_two_level_numpy(idx, 16384, 8192, 8)
    t_py = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)


def test_trigram_module_routes_through_native(mod):
    # trigram.hash_batch should give the same result whether native is on or off
    texts = ["good query", "other title"]
    a = trigram.hash_batch(texts, 30_000, 16)
    os.environ["DSSM_NO_NATIVE"] = "1"
    try:
        # module caches; simulate fallback by calling the internals directly
        b = _python_hash_batch(texts, 30_000, 16)
    finally:
        del os.environ["DSSM_NO_NATIVE"]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1])


@pytest.mark.parametrize("nthreads", ["1", "4"])
def test_dedupe_joint_bit_exact_and_thread_invariant(mod, nthreads,
                                                     monkeypatch):
    """The two-buffer C++ joint entry (no host concat) must be bit-exact with
    the numpy concat path, independent of DSSM_DEDUPE_THREADS (histograms
    merge by integer addition; selection runs on merged arrays)."""
    from dssm_tpu.kernels.dedup_embed import dedupe_two_level_numpy

    monkeypatch.setenv("DSSM_DEDUPE_THREADS", nthreads)
    rng = np.random.default_rng(21)
    # Big enough to cross the threading threshold (1 << 17 entries).
    q = rng.integers(0, 120_000, size=(2048, 32), dtype=np.int32)
    d = rng.integers(0, 120_000, size=(2048, 48), dtype=np.int32)
    nat = native.dedupe_two_level_joint(q, d, 2048, 1024, 8)
    assert nat is not None
    both = np.concatenate([q.reshape(-1), d.reshape(-1)])
    ref = dedupe_two_level_numpy(both, 2048, 1024, 8)
    for name, a, b in zip(("uniq", "row_sel", "inv2", "keep"), nat, ref):
        np.testing.assert_array_equal(np.asarray(a).reshape(-1),
                                      np.asarray(b).reshape(-1),
                                      err_msg=name)
