"""File-backed query-title corpora: TSV / JSONL readers + chunked hashing.

The reference trains on pre-pickled scipy-CSR "packs" of real query/title
click logs (SURVEY.md §3.1 row 2, §4.3 [R-med]) — a private offline format.
The TPU-native equivalent takes plain text files and hashes them online
through the C++ data-plane (native/dssm_native.cpp, GIL-releasing):

  - ``.tsv`` / ``.txt``: one pair per line, ``query<TAB>title``. Extra
    columns (click counts etc.) are ignored; malformed lines are skipped.
  - ``.jsonl``: one JSON object per line with ``"query"`` and ``"title"``
    (or ``"doc"``) string fields.

``load_file_corpus`` is the one-call entry used by cli/train.py when
``--data.path=...`` is set: read, deterministic train/eval split, hash in
chunks (bounded peak memory on large corpora; each chunk streams through the
native hasher).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from dssm_tpu.config import DataConfig, TowerConfig
from dssm_tpu.data.loader import HashedPairs, hash_pairs
from dssm_tpu.data.toy import ToyPairs, train_eval_split

# The pair container is format-agnostic; ToyPairs is just (queries, titles).
Pairs = ToyPairs


def iter_pairs(path: str) -> Iterator[Tuple[str, str]]:
    """Stream (query, title) pairs from a TSV or JSONL file."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".jsonl":
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                q = obj.get("query")
                t = obj.get("title", obj.get("doc"))
                if isinstance(q, str) and isinstance(t, str):
                    yield q, t
    elif ext in (".tsv", ".txt", ""):
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2 and parts[0] and parts[1]:
                    yield parts[0], parts[1]
    else:
        raise ValueError(
            f"unsupported corpus format {ext!r} for {path!r} "
            "(use .tsv/.txt or .jsonl)"
        )


def read_pairs(path: str, max_pairs: int = 0) -> Pairs:
    """Materialize a corpus file as a Pairs container.

    max_pairs > 0 truncates (useful for smoke runs on huge files).
    """
    queries, titles = [], []
    for q, t in iter_pairs(path):
        queries.append(q)
        titles.append(t)
        if max_pairs and len(queries) >= max_pairs:
            break
    if not queries:
        raise ValueError(f"no (query, title) pairs found in {path!r}")
    return Pairs(queries=queries, titles=titles)


def hash_pairs_chunked(
    pairs: Pairs,
    tower: TowerConfig,
    data: DataConfig,
    chunk_size: int = 16384,
) -> HashedPairs:
    """hash_pairs in bounded-memory chunks; bit-identical to one-shot hashing.

    Each chunk runs through the C++ hasher (which releases the GIL), so a
    caller can overlap hashing with other host work via data.loader.prefetch.
    """
    n = len(pairs)
    if n <= chunk_size:
        return hash_pairs(pairs, tower, data)
    chunks = []
    for lo in range(0, n, chunk_size):
        part = Pairs(
            queries=pairs.queries[lo : lo + chunk_size],
            titles=pairs.titles[lo : lo + chunk_size],
        )
        chunks.append(hash_pairs(part, tower, data))
    first = chunks[0]
    out = HashedPairs(
        **{
            f.name: (
                np.concatenate([getattr(c, f.name) for c in chunks])
                if getattr(first, f.name) is not None
                else None
            )
            for f in first.__dataclass_fields__.values()
        }
    )
    return out


def load_file_corpus(
    tower: TowerConfig,
    data: DataConfig,
    path: Optional[str] = None,
) -> Tuple[HashedPairs, HashedPairs, Pairs, Pairs]:
    """Read, split, and hash a corpus file.

    Returns (hashed_train, hashed_eval, train_pairs, eval_pairs). The split
    is a deterministic seeded permutation (same on every host — required for
    the multi-host disjoint-shard batch contract, SURVEY.md §8 hard part 6).
    """
    path = path or data.path
    if not path:
        raise ValueError("data.path is empty; nothing to load")
    pairs = read_pairs(path, data.max_pairs)
    train_pairs, eval_pairs = train_eval_split(
        pairs, eval_frac=data.eval_frac, seed=data.seed
    )
    hashed_train = hash_pairs_chunked(train_pairs, tower, data)
    hashed_eval = hash_pairs_chunked(eval_pairs, tower, data)
    return hashed_train, hashed_eval, train_pairs, eval_pairs


def write_tsv(pairs: Pairs, path: str) -> None:
    """Inverse of read_pairs for .tsv — used by tests and the toy exporter."""
    with open(path, "w", encoding="utf-8") as f:
        for q, t in zip(pairs.queries, pairs.titles):
            f.write(f"{q}\t{t}\n")
