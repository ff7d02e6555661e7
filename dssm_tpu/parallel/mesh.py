"""Device mesh construction: axes ('data', 'model').

Reference: single process, single device, zero parallelism (SURVEY.md §3.3).
The build scales via a jax.sharding.Mesh:

  data  — batch sharding (DP); also the axis the doc-embedding all-gather
          (global negative pool) rides, over ICI within a slice
  model — vocab-axis sharding of the trigram embedding table (TP), engaged
          when vocab x width exceeds the per-chip HBM budget (BASELINE.json:11)

XLA owns collective scheduling on ICI/DCN; this layer only fixes the layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dssm_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = cfg.model_parallel
    dp = cfg.data_parallel
    if dp == -1:
        if n % mp != 0:
            raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    grid = np.asarray(devices).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def vocab_sharded(mesh: Mesh) -> NamedSharding:
    """Embedding tables [V, H]: rows split over 'model'."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))
