"""Dump + analyze the SPMD-partitioned HLO of the multihost sparse step.

VERDICT r5 item 5: evidence for the all-gather-overlap claim. This
environment has ONE physical TPU chip, so an 8-chip TPU executable (with
the TPU latency-hiding scheduler's async all-gather-start/done pairs)
cannot be produced; what CAN be produced is the SPMD-partitioned,
optimized HLO of the REAL 8-device program on the CPU backend. That module
shows (a) which collectives the program actually executes, with shapes,
and (b) the dependency structure — which compute instructions are neither
ancestors nor descendants of each collective and can therefore legally
overlap it under any scheduler. The exposed-comm terms in
parallel/comm_model.py are classified from exactly this structure.

Writes artifacts/overlap_hlo_cpu8.md (summary + collective lines) and
artifacts/overlap_hlo_cpu8.txt.gz (full optimized HLO).

Run: python tools/dump_overlap_hlo.py
"""

import gzip
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize registers axon

import numpy as np  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def build_program():
    """The multihost preset's SPMD sparse step at the REAL dedup caps
    (16384/8192) on the dp=4 x mp=2 CPU mesh — the same scaled
    instantiation tests/test_parallel_sparse.py::
    test_multihost_preset_real_caps_scaled drives."""
    from dssm_tpu.config import (
        DataConfig, LossConfig, MeshConfig, RunConfig, TowerConfig,
        TrainConfig, get_preset,
    )
    from dssm_tpu.data import loader, toy
    from dssm_tpu.models import base as mb
    from dssm_tpu.parallel import mesh as mesh_lib
    from dssm_tpu.parallel.train_step import (
        create_sharded_state, make_parallel_train_step, shard_batch,
    )

    mh = get_preset("multihost")
    bg = 8192
    cfg = RunConfig(
        tower=TowerConfig(vocab_size=32768, embed_width=64, hidden_dims=(48,),
                          semantic_dim=32,
                          compute_dtype=mh.tower.compute_dtype),
        data=DataConfig(max_trigrams=16, max_unique=mh.data.max_unique,
                        max_unique_rows=mh.data.max_unique_rows,
                        max_unique_rows_local=mh.data.max_unique_rows_local),
        loss=LossConfig(mode="in_batch"),
        mesh=MeshConfig(data_parallel=4, model_parallel=2,
                        collective_dtype=mh.mesh.collective_dtype),
        train=TrainConfig(batch_size=bg, use_pallas=False),
    )
    pairs = toy.make_toy_pairs(bg, vocab_words=2048, seed=3)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    batch = loader.select_batch(
        hashed, np.arange(bg), False,
        dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows,
        dedup_joint=True)
    batch = loader.reslot_local(batch, cap=cfg.data.max_unique_rows_local,
                                shards=4)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    state = create_sharded_state(cfg, mesh, mb.init_params(cfg.tower, seed=0))
    from dssm_tpu.parallel.sparse_step import make_parallel_sparse_step_body

    body = make_parallel_sparse_step_body(cfg, mesh, impl="xla")
    with mesh:
        lowered = jax.jit(body).lower(state, shard_batch(batch, mesh))
        compiled = lowered.compile()
    return compiled.as_text(), cfg


_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)\(")
_USE_RE = re.compile(r"%([\w.\-]+)")

COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")
COMPUTE = ("dot", "fusion", "convolution")


def analyze(hlo: str):
    """Per-computation dependency analysis: for each collective, count the
    compute instructions (dot/fusion) that are neither ancestors nor
    descendants — the legal-overlap set."""
    reports = []
    # split computations on lines like "%name (param: ...) -> ... {" or
    # "ENTRY %name ..."
    comp = []
    name = None
    for line in hlo.splitlines():
        if line.rstrip().endswith("{") and ("(" in line):
            name = line.split("(")[0].strip().lstrip("%")
            comp = []
        elif line.strip() == "}" and name is not None:
            reports.append((name, comp))
            name = None
        elif name is not None:
            comp.append(line)

    out = []
    for cname, lines in reports:
        defs = {}
        ops = {}
        order = []
        for ln in lines:
            m = _DEF_RE.match(ln)
            if not m:
                continue
            iname, op = m.group(1), m.group(2)
            uses = [u for u in _USE_RE.findall(ln) if u != iname and u in defs]
            defs[iname] = set(uses)
            ops[iname] = (op, ln.strip())
            order.append(iname)
        colls = [n for n in order if any(
            ops[n][0].startswith(c) for c in COLLECTIVES)]
        if not colls:
            continue
        # transitive closures
        anc = {}
        for n in order:  # topological (defs precede uses in HLO text)
            s = set(defs[n])
            for u in defs[n]:
                s |= anc.get(u, set())
            anc[n] = s
        desc = {n: set() for n in order}
        for n in order:
            for a in anc[n]:
                desc.setdefault(a, set()).add(n)
        for n in colls:
            op, line = ops[n]
            compute_all = [m_ for m_ in order
                           if ops[m_][0] in COMPUTE]
            independent = [m_ for m_ in compute_all
                           if m_ not in desc.get(n, set())
                           and m_ not in anc.get(n, set())]
            out.append({
                "computation": cname,
                "name": n,
                "op": op,
                "line": line[:400],
                "compute_total": len(compute_all),
                "compute_independent": len(independent),
                "independent_sample": independent[:8],
            })
    return out


def main():
    os.makedirs(ART, exist_ok=True)
    hlo, cfg = build_program()
    with gzip.open(os.path.join(ART, "overlap_hlo_cpu8.txt.gz"), "wt") as f:
        f.write(hlo)
    reps = analyze(hlo)
    lines = [
        "# SPMD collective / overlap evidence (CPU-8 optimized HLO)",
        "",
        "Program: multihost-preset sparse step, dp=4 x mp=2, global batch "
        "8192, REAL dedup caps 16384/8192, sel_local 2048, collective_dtype="
        f"{cfg.mesh.collective_dtype}.",
        "",
        "One physical TPU chip exists in this environment, so the TPU "
        "latency-hiding schedule (async all-gather-start/done) cannot be "
        "compiled here; this artifact certifies the COLLECTIVES the real "
        "8-device program executes and, for each, how many dot/fusion "
        "instructions are dependency-independent of it (legally "
        "overlappable under any scheduler). parallel/comm_model.py's "
        "exposed/overlappable classification is read off this structure.",
        "",
    ]
    for r in reps:
        lines.append(f"## {r['op']} `{r['name']}` in `{r['computation']}`")
        lines.append("```")
        lines.append(r["line"])
        lines.append("```")
        lines.append(
            f"- independent compute instructions (legal overlap set): "
            f"{r['compute_independent']} of {r['compute_total']} "
            f"dot/fusion in this computation")
        if r["independent_sample"]:
            lines.append(
                f"- sample: {', '.join(r['independent_sample'])}")
        lines.append("")
    lines += [
        "## Legend: observed op -> comm_model term",
        "",
        "- `all-gather f32[BG, D]` over the data groups = the doc-pool "
        "all-gather (global negative pool). Its operand is the local "
        "d-tower L2-normalize fusion; its only transitive users are loss "
        "ops — every q-side dot/fusion in the independent set above can "
        "legally overlap it.",
        "- `reduce-scatter f32[B_local, D]` over data = the pool "
        "all-gather's backward transpose (SURVEY.md §8 hard part 1 — "
        "verified here in the HLO, as promised).",
        "- `all-reduce f32[u1_rows, h]` over the mp pairs = the vocab-"
        "sharded compact-gather psum (fwd, exposed).",
        "- `all-reduce f32[u2, h]` over ALL devices = the compact-grad "
        "psum in the SEL BASIS — u2 rows, not the group-padded u1_rows: "
        "the r5 rows2 re-basis, visible in the wire shape. Exposed (end "
        "of backward).",
        "- `all-reduce f32[]` = the loss-scalar psum (negligible).",
        "",
        "NOTE (wire dtype): mesh.collective_dtype='bfloat16' casts both "
        "big psum payloads to bf16, but this CPU-backend HLO shows XLA "
        "promoting them back to f32 all-reduces (`*_promoted` reduction "
        "computations). Whether the TPU backend keeps the bf16 wire is "
        "backend/flag-dependent and unverifiable on a 1-chip environment; "
        "parallel/comm_model.py and BASELINE.md therefore quote BOTH the "
        "f32-wire and bf16-wire efficiency numbers.",
        "",
    ]
    md = "\n".join(lines)
    with open(os.path.join(ART, "overlap_hlo_cpu8.md"), "w") as f:
        f.write(md)
    n_coll = len(reps)
    print(f"wrote artifacts/overlap_hlo_cpu8.md ({n_coll} collectives) "
          f"+ overlap_hlo_cpu8.txt.gz ({len(hlo)/1e6:.1f} MB text)")
    for r in reps:
        print(f"  {r['op']:20s} {r['name'][:40]:42s} "
              f"independent compute {r['compute_independent']}/"
              f"{r['compute_total']}")


if __name__ == "__main__":
    main()
