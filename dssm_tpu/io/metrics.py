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
    """JSONL metrics (the primary contract) + optional TensorBoard events.

    TensorBoard mirrors the reference's separate train/test SummaryWriters:
    each record's `tag` becomes the TB sub-writer ("train", "eval", ...) and
    scalar metrics land under their own names.
    """

    def __init__(self, path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None):
        self._fh: Optional[IO[str]] = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._tb_dir = tensorboard_dir
        self._tb_writers: Dict[str, Any] = {}

    def _tb(self, tag: str):
        if self._tb_dir is None:
            return None
        if tag not in self._tb_writers:
            try:
                from torch.utils.tensorboard import SummaryWriter
            except ImportError:
                self._tb_dir = None
                return None
            self._tb_writers[tag] = SummaryWriter(
                os.path.join(self._tb_dir, tag)
            )
        return self._tb_writers[tag]

    def write(self, tag: str, step: int, metrics: Dict[str, Any]) -> None:
        record = {"tag": tag, "step": step, "time": time.time(), **metrics}
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
        tb = self._tb(tag)
        if tb is not None:
            for name, value in metrics.items():
                if isinstance(value, (int, float)):
                    tb.add_scalar(name, value, global_step=step)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        for w in self._tb_writers.values():
            w.close()
        self._tb_writers.clear()


def weight_summaries(params, histogram_bins: int = 0) -> Dict:
    """Per-weight mean/stddev/min/max, the reference's variable_summaries().

    histogram_bins > 0 additionally emits a fixed-bin histogram per weight
    (the reference's tf.summary.histogram analogue): lists of bin counts and
    edges under <name>/hist_counts, <name>/hist_edges.
    """
    out: Dict = {}
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
        if histogram_bins > 0:
            import numpy as np

            counts, edges = np.histogram(
                np.asarray(x, dtype=np.float32).ravel(), bins=histogram_bins)
            out[f"{name}/hist_counts"] = counts.tolist()
            out[f"{name}/hist_edges"] = [round(float(e), 6) for e in edges]
    return out
