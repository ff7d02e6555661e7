"""Multi-host process initialization over DCN.

Reference: single process, no distributed runtime (SURVEY.md §3.4). The build
uses jax.distributed: one controller process per host, coordinated through a
coordinator address; after initialize(), jax.devices() spans the whole slice
and the pjit train step (parallel/train_step.py) runs SPMD with XLA
scheduling collectives over ICI (intra-slice) / DCN (cross-slice).

Configuration via env (the conventions TPU pod launchers use) or args:
  DSSM_COORDINATOR  host:port of process 0
  DSSM_NUM_PROCS    number of processes
  DSSM_PROC_ID      this process's id
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize from args or env; no-op for
    single-process runs (nothing configured)."""
    coordinator = coordinator or os.environ.get("DSSM_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("DSSM_NUM_PROCS", "0")) or None
    if process_id is None:
        pid = os.environ.get("DSSM_PROC_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def make_global_batch(batch, mesh, stacked: bool = False):
    """Assemble per-host local batch shards into global jax.Arrays.

    Single-process: equivalent to shard_batch. Multi-host: each host passes
    its LOCAL shard (loader.batch_iterator(process_index=...)) and the result
    is a global array of total batch = sum of shards, batch-sharded over
    'data'; *_uniq / rot_offsets are host-local replicated fields and must be
    identical across hosts for replicated semantics — the loader's
    deterministic seeding guarantees it for rot_offsets; *_uniq fields are
    per-host and therefore only valid in per-host lookup contexts (the lookup
    happens before the all-gather, so per-host uniq is correct).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dssm_tpu.parallel.mesh import DATA_AXIS

    if jax.process_count() == 1:
        from dssm_tpu.parallel.train_step import shard_batch

        return shard_batch(batch, mesh, stacked=stacked)

    batch_spec = P(None, DATA_AXIS) if stacked else P(DATA_AXIS)
    sel_local_spec = P(None, DATA_AXIS, None) if stacked else P(DATA_AXIS,
                                                                None)
    out = {}
    for k, v in batch.items():
        if k == "sel_local":
            # Per-data-shard slot lists [shards_local, cap] (or [K, shards,
            # cap] stacked): the leading (post-K) dim concatenates over
            # hosts into the global data axis.
            sharding = NamedSharding(mesh, sel_local_spec)
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        elif (k in ("rot_offsets", "uniq", "sel")
                or k.endswith("_uniq") or k.endswith("_sel")):
            sharding = NamedSharding(mesh, P())
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            sharding = NamedSharding(mesh, batch_spec)
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
