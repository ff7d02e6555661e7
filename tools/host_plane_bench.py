"""Host data-plane cost at the multihost preset, itemized + W-curve + cache.

VERDICT r5 item 4: substantiate the host-side per-step budget with
measurement instead of arithmetic — (a) itemize the per-batch stages
INCLUDING reslot_local (absent from the r4 budget), (b) measure the
pipeline W-scaling curve on this box, (c) measure the epoch-cache steady
state (data.cache_epoch_batches): from epoch 2 on, a batch costs a dict
lookup.

Pure host work (numpy + the C++ data plane); no TPU involved.
Run: python tools/host_plane_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dssm_tpu.config import get_preset  # noqa: E402
from dssm_tpu.data import hash_pairs, make_toy_pairs  # noqa: E402
from dssm_tpu.data import loader  # noqa: E402
from dssm_tpu.data.remap import apply_remap, build_freq_remap  # noqa: E402

HOSTS = 8          # per-host shard of the 65,536 global batch
LOCAL_SHARDS = 4   # v5e-8 host at mp=2 -> 4 data shards per host


def main():
    cfg = get_preset("multihost")
    gb = cfg.train.batch_size  # 65536
    n = cfg.data.toy_num_pairs  # 131072
    t0 = time.perf_counter()
    pairs = make_toy_pairs(n, vocab_words=cfg.data.toy_vocab_words, seed=1)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)
    hashed = apply_remap(hashed, build_freq_remap(hashed,
                                                  cfg.tower.vocab_size))
    print(f"corpus: {n} pairs hashed+remapped in "
          f"{time.perf_counter()-t0:.1f} s (one-off)")

    # ---- (a) itemized single batch --------------------------------------
    rng = np.random.default_rng(0)
    rows = rng.permutation(n)[:gb]
    reps = 3

    def timeit(fn, label):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt = (time.perf_counter() - t0) / reps
        print(f"  {label:44s} {dt*1e3:8.1f} ms")
        return out, dt

    base, t_dedupe = timeit(
        lambda: loader._global_dedup_local_batch(
            hashed, rows, False, cfg.data.max_unique, 8,
            cfg.data.max_unique_rows, True, 0, gb // HOSTS),
        "global two-level dedupe + local slice (C++)")
    sortd, t_sort = timeit(lambda: loader.sort_batch_rows(dict(base)),
                           "sort_batch_rows")
    resl, t_reslot = timeit(
        lambda: loader.reslot_local(dict(sortd),
                                    cfg.data.max_unique_rows_local,
                                    LOCAL_SHARDS),
        f"reslot_local (cap {cfg.data.max_unique_rows_local} x "
        f"{LOCAL_SHARDS} shards)")
    plan = loader.wire_dtype_plan(hashed, cfg.data.max_unique,
                                  cfg.data.max_unique_rows)
    _, t_wire = timeit(lambda: loader.compress_wire(dict(resl), plan),
                       "compress_wire")
    total = t_dedupe + t_sort + t_reslot + t_wire
    print(f"  {'TOTAL per batch (serial, itemized)':44s} {total*1e3:8.1f} ms")

    # ---- (b) W-scaling curve through batch_iterator ---------------------
    nbatches = 6
    for w in (0, 2, 4):
        it = loader.batch_iterator(
            hashed, gb, False, seed=1, process_index=0, process_count=HOSTS,
            dedup_unique=cfg.data.max_unique, dedup_group=8,
            dedup_unique_rows=cfg.data.max_unique_rows, dedup_joint=True,
            wire_compress=True, sort_rows=True,
            local_sel_cap=cfg.data.max_unique_rows_local,
            local_sel_shards=LOCAL_SHARDS,
            pipeline_workers=w)
        next(it)  # warm (fills the pool)
        t0 = time.perf_counter()
        for _ in range(nbatches):
            next(it)
        dt = (time.perf_counter() - t0) / nbatches
        print(f"  pipeline W={w or 1}: {dt*1e3:8.1f} ms/batch effective "
              f"({os.cpu_count()} cores on this box)")

    # ---- (c) epoch cache steady state -----------------------------------
    it = loader.batch_iterator(
        hashed, gb, False, seed=1, process_index=0, process_count=HOSTS,
        dedup_unique=cfg.data.max_unique, dedup_group=8,
        dedup_unique_rows=cfg.data.max_unique_rows, dedup_joint=True,
        wire_compress=True, sort_rows=True,
        local_sel_cap=cfg.data.max_unique_rows_local,
        local_sel_shards=LOCAL_SHARDS,
        reshuffle_each_epoch=False, cache_epoch_batches=True)
    bpe = n // gb
    t0 = time.perf_counter()
    for _ in range(bpe):
        next(it)
    cold = (time.perf_counter() - t0) / bpe
    t0 = time.perf_counter()
    warm_batches = 3 * bpe
    for _ in range(warm_batches):
        next(it)
    warm = (time.perf_counter() - t0) / warm_batches
    print(f"  epoch cache: epoch-1 {cold*1e3:.1f} ms/batch, "
          f"epoch>=2 {warm*1e3:.3f} ms/batch "
          f"(reshuffle_each_epoch=False, cache_epoch_batches=True)")


if __name__ == "__main__":
    main()
