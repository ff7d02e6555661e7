"""Export + retrieval entry point (the serving path).

Build a doc-embedding index from a trained checkpoint, then retrieve:

    # embed the corpus titles -> index file
    python -m dssm_tpu.cli.export --preset=tiny --io.workdir=/tmp/run \
        --out=/tmp/run/index.npz [--cpu]

    # top-k retrieval against an index (ad-hoc query or a query file)
    python -m dssm_tpu.cli.export --preset=tiny --io.workdir=/tmp/run \
        --index=/tmp/run/index.npz --query="best hiking boots" --k=5 [--cpu]

With --data.path=... the corpus comes from the TSV/JSONL file (titles of the
train split are indexed); otherwise the toy corpus. The reference repo has no
serving layer at all (SURVEY.md §2.1); see dssm_tpu/serve/retrieval.py for
the design.
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

from dssm_tpu.cli.train import coerce_overrides, parse_argv


def _split_serving_flags(argv: List[str]):
    """Pull export-specific flags out before the config parser sees them."""
    out, index, query, query_file, k = None, None, None, None, 10
    rest = []
    for arg in argv:
        if arg.startswith("--out="):
            out = arg.split("=", 1)[1]
        elif arg.startswith("--index="):
            index = arg.split("=", 1)[1]
        elif arg.startswith("--query="):
            query = arg.split("=", 1)[1]
        elif arg.startswith("--query_file="):
            query_file = arg.split("=", 1)[1]
        elif arg.startswith("--k="):
            k = int(arg.split("=", 1)[1])
        else:
            rest.append(arg)
    return out, index, query, query_file, k, rest


def main(argv: Optional[List[str]] = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    out, index_path, query, query_file, k, rest = _split_serving_flags(argv)
    preset, cpu, _resume, raw_overrides = parse_argv(rest)
    if cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from dssm_tpu.config import get_preset
    from dssm_tpu.config import validate as validate_cfg
    from dssm_tpu.io.checkpoint import Checkpointer
    from dssm_tpu.models import base as model_base
    from dssm_tpu.serve import (
        build_doc_index, embed_queries, load_index, save_index, top_k,
    )
    from dssm_tpu.train.state import create_run_state

    cfg = validate_cfg(coerce_overrides(get_preset(preset), raw_overrides))
    impl = "auto" if cfg.train.use_pallas else "xla"

    # Vocab remap persisted by training (data/remap.py): serving inputs must
    # go through the same permutation the trained table rows live in.
    from dssm_tpu.data.remap import load_remap

    remap = load_remap(cfg.io.workdir)
    if remap is not None:
        print(f"applying saved vocab remap from {cfg.io.workdir}",
              file=sys.stderr)

    params = model_base.init_params(cfg.tower, seed=cfg.train.seed)
    state = create_run_state(cfg, params)
    ckpt = Checkpointer(cfg.io.workdir, keep=cfg.train.keep_checkpoints)
    restored = ckpt.restore(state)
    if restored is None:
        print(f"no checkpoint under {ckpt.directory}; using fresh init",
              file=sys.stderr)
    else:
        state = restored
        print(f"restored step {int(state.step)}", file=sys.stderr)

    if out:
        # Build the index from the corpus titles.
        if cfg.data.path:
            from dssm_tpu.data import read_pairs

            pairs = read_pairs(cfg.data.path, cfg.data.max_pairs)
            titles = list(dict.fromkeys(pairs.titles))  # dedupe, keep order
        else:
            from dssm_tpu.data import make_toy_pairs

            pairs = make_toy_pairs(cfg.data.toy_num_pairs,
                                   cfg.data.toy_vocab_words, cfg.data.seed)
            titles = list(dict.fromkeys(pairs.titles))
        emb = build_doc_index(state.params, cfg, titles,
                              cfg.train.batch_size, impl, remap)
        save_index(out, emb, titles)
        print(json.dumps({"indexed_docs": len(titles), "dim": emb.shape[1],
                          "path": out}))
        return

    if index_path:
        doc_emb, titles = load_index(index_path)
        if query is not None:
            queries = [query]
        elif query_file:
            with open(query_file) as f:
                queries = [line.strip() for line in f if line.strip()]
        else:
            raise SystemExit("--index needs --query=... or --query_file=...")
        q_emb = embed_queries(state.params, cfg, queries,
                              cfg.train.batch_size, impl, remap)
        scores, ids = top_k(q_emb, doc_emb, k=k)
        for qi, qtext in enumerate(queries):
            print(json.dumps({
                "query": qtext,
                "results": [
                    {"rank": r + 1, "doc_id": int(ids[qi, r]),
                     "title": titles[int(ids[qi, r])],
                     "score": float(scores[qi, r])}
                    for r in range(ids.shape[1])
                ],
            }))
        return

    raise SystemExit("pass --out=index.npz to build an index, or "
                     "--index=index.npz --query=... to retrieve")


if __name__ == "__main__":
    main()
