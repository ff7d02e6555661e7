"""Frequency-ordered vocab remap: cluster hot trigram rows for DMA locality.

Why this exists (measured on v5e, tools/profile_components.py): the dedup
gather/scatter kernels issue one row-group DMA per unique vocab GROUP a batch
touches, at ~240 ns of issue cost each. FNV-hashed trigram ids are uniformly
random over the 500k-row table, so a batch's ~800 unique rows land in ~800
DISTINCT 8/16-row groups — the group-DMA count equals the row count, and the
step is DMA-issue-bound (gather 242 us + scatter 298 us of a 767 us step).

Trigram frequencies are Zipf-distributed, and the row layout is ours to
choose: remapping ids by corpus frequency rank packs the hot rows into a
dense prefix of the table, so the rows a batch touches collapse into FAR
fewer groups (each fully used instead of 1/16th used). Pure permutation of
table rows — training math is unchanged; only DMA locality improves.

Reference parity note: the reference (SURVEY.md §3.1 row 1) hashes offline
into whatever order the prep script emits; row order is semantically free
there too. This module is TPU-native layout optimization, no behavior change.

Sharded tables (TP over 'model'): a plain frequency sort would pile every
hot row onto shard 0. `num_shards` stripes rank r to shard r % S at slot
r // S, giving every shard its own dense hot prefix (balanced DMA load and
balanced gradient traffic).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dssm_tpu.data.loader import HashedPairs

PAD_INDEX = 0  # data/trigram.py reserves row 0 for padding

# The remap is part of the trained model: table rows live at remapped
# positions, so eval/serving must push inputs through the SAME permutation.
# Training persists it next to the checkpoints under this name.
REMAP_FILE = "vocab_remap.npy"


def save_remap(workdir: str, remap: np.ndarray) -> str:
    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, REMAP_FILE)
    np.save(path, remap.astype(np.int32))
    return path


def load_remap(workdir: str) -> Optional[np.ndarray]:
    """The remap saved by training, or None if the run never built one."""
    path = os.path.join(workdir, REMAP_FILE)
    if not os.path.exists(path):
        return None
    return np.load(path)


def build_freq_remap(
    hashed: HashedPairs, vocab_size: int, num_shards: int = 1
) -> np.ndarray:
    """remap [vocab_size] int32: old id -> new id, frequency-ranked.

    Rank ids by (occurrence count desc, id asc) over the hashed corpus
    (occurrences = slots with nonzero weight, both sides). PAD_INDEX stays
    fixed at 0. Unseen ids follow the ranked ones in id order (deterministic:
    the same corpus always yields the same permutation).
    """
    counts = np.zeros((vocab_size,), dtype=np.int64)
    for idx, wgt in ((hashed.q_idx, hashed.q_wgt), (hashed.d_idx, hashed.d_wgt)):
        flat = idx.reshape(-1)[wgt.reshape(-1) > 0]
        counts += np.bincount(flat, minlength=vocab_size)
    counts[PAD_INDEX] = 0
    # Stable argsort of -counts: count desc, id asc. PAD excluded then
    # reinserted at position 0.
    order = np.argsort(-counts, kind="stable")
    order = order[order != PAD_INDEX]
    # Destination rows in assignment order: shard-striped so each of the S
    # vocab shards gets its own hot prefix; row 0 is reserved for PAD.
    v = vocab_size
    if num_shards > 1:
        if v % num_shards:
            raise ValueError(f"vocab {v} not divisible by {num_shards} shards")
        per = v // num_shards
        ranks = np.arange(v, dtype=np.int64)
        dests = (ranks % num_shards) * per + ranks // num_shards
    else:
        dests = np.arange(v, dtype=np.int64)
    dests = dests[dests != PAD_INDEX]
    remap = np.empty((v,), dtype=np.int32)
    remap[PAD_INDEX] = PAD_INDEX
    remap[order] = dests[: order.shape[0]].astype(np.int32)
    return remap


def apply_remap(hashed: HashedPairs, remap: np.ndarray) -> HashedPairs:
    """New HashedPairs with every index field mapped through `remap`."""
    def m(a: Optional[np.ndarray]) -> Optional[np.ndarray]:
        return None if a is None else remap[a]

    return HashedPairs(
        q_idx=m(hashed.q_idx),
        q_wgt=hashed.q_wgt,
        d_idx=m(hashed.d_idx),
        d_wgt=hashed.d_wgt,
        q_seq_idx=m(hashed.q_seq_idx),
        q_seq_wgt=hashed.q_seq_wgt,
        q_mask=hashed.q_mask,
        d_seq_idx=m(hashed.d_seq_idx),
        d_seq_wgt=hashed.d_seq_wgt,
        d_mask=hashed.d_mask,
    )
