"""Structured JSONL metrics + optional TensorBoard-style summaries.

Reference: `variable_summaries()` + `tf.summary.*` into TensorBoard event
files, separate train/test writers (SURVEY.md §3.1 row 8 [R-high]). The build
writes newline-delimited JSON (one record per log event, tagged train/eval)
which the bench harness reads back; weight-stat summaries are behind a flag.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, IO, Optional

import jax
import jax.numpy as jnp


class MetricsWriter:
    def __init__(self, path: Optional[str] = None):
        self._fh: Optional[IO[str]] = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def write(self, tag: str, step: int, metrics: Dict[str, Any]) -> None:
        record = {"tag": tag, "step": step, "time": time.time(), **metrics}
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def weight_summaries(params) -> Dict[str, float]:
    """Per-weight mean/stddev/min/max, the reference's variable_summaries()."""
    out: Dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        x = jnp.asarray(leaf)
        out[f"{name}/mean"] = float(jnp.mean(x))
        out[f"{name}/stddev"] = float(jnp.std(x))
        out[f"{name}/min"] = float(jnp.min(x))
        out[f"{name}/max"] = float(jnp.max(x))
    return out
