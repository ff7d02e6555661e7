"""Per-step collective traffic model, derived from the config + mesh shape.

VERDICT r5 item 5: the scaling-efficiency number must derive its exposed-
communication term from the mesh shape and the program's actual collectives,
not a hardcoded constant. This module enumerates every collective the SPMD
sparse step (parallel/sparse_step.py) executes per step, sizes each from the
config, and classifies it as overlappable (a concurrent compute window
exists in the dependency graph — see tools/dump_overlap_hlo.py for the
graph evidence) or exposed (on the critical path with no independent work).

Hardware constants are the public v5e figures used in BASELINE.md: an
all-gather/all-reduce ring over one mesh axis sustains ~90 GB/s effective
per direction (2 of the 4 ICI links).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

ICI_BW = 90e9  # bytes/s effective per ring direction (BASELINE.md)


@dataclass
class Term:
    name: str
    mbytes: float
    ms: float
    exposed: bool
    note: str


def _allreduce_ms(payload_bytes: float, p: int) -> float:
    # ring all-reduce: reduce-scatter + all-gather, 2*(p-1)/p * B / bw
    if p <= 1:
        return 0.0
    return 2 * (p - 1) / p * payload_bytes / ICI_BW * 1e3


def _allgather_ms(total_bytes: float, p: int) -> float:
    # each chip receives (p-1)/p of the gathered total
    if p <= 1:
        return 0.0
    return (p - 1) / p * total_bytes / ICI_BW * 1e3


def step_collectives(cfg, dp: int, mp: int, *,
                     sel_basis_grad: bool = False,
                     gather_allgather: bool = False,
                     collective_itemsize: int = 4) -> List[Term]:
    """All collectives of ONE multihost sparse train step.

    cfg: the RunConfig (multihost preset shapes). dp/mp: mesh axis sizes.
    sel_basis_grad / gather_allgather model the r5 comm reductions
    (parallel/sparse_step.py): the compact-grad psum in the unique-row sel
    basis instead of the group-padded compact basis, and the mp gather
    exchanging owned rows by all-gather instead of zero-padded psum.
    """
    h_pad = ((cfg.tower.embed_width + 127) // 128) * 128
    table_itemsize = {"float32": 4, "bfloat16": 2, "int8": 1}[
        cfg.tower.table_dtype_resolved or "float32"]
    group = {4: 8, 2: 16, 1: 32}[table_itemsize]
    u1_rows = (cfg.data.max_unique // 8) * group  # compact rows gathered
    u2 = cfg.data.max_unique_rows  # exact unique-row slots (sel basis)
    b_global = cfg.train.batch_size
    d_emb = cfg.tower.semantic_dim
    terms: List[Term] = []

    if mp > 1:
        # Wire dtype: mesh.collective_dtype casts the psum payload (the
        # local partial is bf16 on the wire even for an f32 table); a bf16
        # table is already 2 B. CAVEAT: the CPU-backend HLO artifact shows
        # XLA promoting bf16 all-reduces back to f32 wires
        # (artifacts/overlap_hlo_cpu8.md) — if the TPU backend does the
        # same, double these two psum terms (quoted in BASELINE.md).
        payload = u1_rows * h_pad * min(table_itemsize, collective_itemsize)
        if gather_allgather:
            terms.append(Term(
                "fwd compact gather (mp): all-gather owned rows",
                payload / 1e6, _allgather_ms(payload, mp), True,
                "each shard contributes its owned rows once; receives "
                f"(mp-1)/mp x {payload/1e6:.1f} MB — half the psum bytes; "
                "start of step, predecessor is the previous scatter -> "
                "exposed"))
        else:
            terms.append(Term(
                "fwd compact gather (mp): zero-padded psum",
                payload / 1e6, _allreduce_ms(payload, mp), True,
                "local partial gather + psum over 'model'; exposed (first "
                "op of the step)"))

    if dp > 1:
        # doc-pool all-gather over 'data' (the global negative pool)
        pool = b_global * d_emb * 4
        terms.append(Term(
            "doc-pool all-gather (data)", pool / 1e6,
            _allgather_ms(pool, dp), False,
            "input: local d-tower output; users: flash loss only. "
            "Overlap window: q-side count build + gather + towers run "
            "between d-tower and the loss (tools/profile_components.py "
            "stage table; tools/dump_overlap_hlo.py dependency evidence)"))
        terms.append(Term(
            "loss bwd reduce-scatter (data)", pool / 1e6,
            _allgather_ms(pool, dp), False,
            "transpose of the all-gather; overlaps the tower backward "
            "chain that follows it"))
        # compact-grad psum over 'data' — the term the r4 model MISSED:
        # the replicated compact's gradient is combined across data shards
        # before the (data-replicated) table scatter; it is produced at the
        # very end of the backward chain, so nothing independent remains ->
        # exposed.
        grows = u2 if sel_basis_grad else u1_rows
        gpay = grows * h_pad * collective_itemsize
        terms.append(Term(
            "compact-grad psum (data)" + (
                " [sel basis]" if sel_basis_grad else " [group-padded]"),
            gpay / 1e6, _allreduce_ms(gpay, dp), True,
            f"{grows} rows x {h_pad} x {collective_itemsize}B; exposed "
            "(end of backward; scatter + next-step gather depend on it)"))
        # dense tower grads psum
        dense = 2 * (cfg.tower.embed_width * 128 + 128 * 128) * 4  # approx
        terms.append(Term(
            "dense-grad psum (data)", dense / 1e6,
            _allreduce_ms(dense, dp), True,
            "~0.5 MB of tower params; exposed but negligible"))
    return terms


def scaling_efficiency(t_step_ms: float, cfg, dp: int, mp: int,
                       **kw) -> tuple:
    """(efficiency, exposed_ms, terms): t_compute / (t_compute + exposed)."""
    terms = step_collectives(cfg, dp, mp, **kw)
    exposed = sum(t.ms for t in terms if t.exposed)
    return t_step_ms / (t_step_ms + exposed), exposed, terms
