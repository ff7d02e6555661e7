"""Evaluation entry point: restore a checkpoint, rank the eval corpus,
report Recall@K / NDCG@10 / MRR (the parity metrics, BASELINE.json:2).

    python -m dssm_tpu.cli.eval --preset=tiny --io.workdir=/tmp/run [--cpu]
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

from dssm_tpu.cli.train import coerce_overrides, parse_argv


def main(argv: Optional[List[str]] = None) -> None:
    preset, cpu, _resume, raw_overrides = parse_argv(
        sys.argv[1:] if argv is None else argv
    )
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
    from dssm_tpu.data import hash_pairs, make_toy_pairs, train_eval_split
    from dssm_tpu.io.checkpoint import Checkpointer
    from dssm_tpu.models import base as model_base
    from dssm_tpu.train.eval import evaluate
    from dssm_tpu.train.state import create_run_state

    from dssm_tpu.config import validate as validate_cfg

    cfg = validate_cfg(coerce_overrides(get_preset(preset), raw_overrides))
    if cfg.data.path:
        # Mirror cli/train.py: the held-out split of the SAME file corpus
        # (same seed => same split), so a train-from-file run can be
        # evaluated from this CLI.
        from dssm_tpu.data import load_file_corpus

        _, hashed_eval, _, _ = load_file_corpus(cfg.tower, cfg.data)
        print(f"corpus {cfg.data.path}: {len(hashed_eval)} eval pairs",
              file=sys.stderr)
    else:
        pairs = make_toy_pairs(cfg.data.toy_num_pairs,
                               cfg.data.toy_vocab_words, cfg.data.seed)
        _, eval_pairs = train_eval_split(pairs, eval_frac=cfg.data.eval_frac,
                                         seed=cfg.data.seed)
        hashed_eval = hash_pairs(eval_pairs, cfg.tower, cfg.data)

    # Training may have remapped the vocab (data/remap.py); table rows live
    # at remapped positions, so eval inputs must go through the SAME
    # permutation. The remap is persisted in the workdir by cli/train.py.
    from dssm_tpu.data.remap import apply_remap, load_remap

    remap = load_remap(cfg.io.workdir)
    if remap is not None:
        hashed_eval = apply_remap(hashed_eval, remap)
        print(f"applied saved vocab remap from {cfg.io.workdir}",
              file=sys.stderr)

    params = model_base.init_params(cfg.tower, seed=cfg.train.seed)
    state = create_run_state(cfg, params)
    ckpt = Checkpointer(cfg.io.workdir, keep=cfg.train.keep_checkpoints)
    restored = ckpt.restore(state)
    if restored is None:
        print(f"no checkpoint under {ckpt.directory}; evaluating fresh init",
              file=sys.stderr)
    else:
        state = restored
        print(f"restored step {int(state.step)}", file=sys.stderr)

    # Same impl convention as cli/train.py: "auto" resolves to Pallas on TPU
    # and XLA elsewhere (kernels/dedup_embed.py dispatch).
    impl = "auto" if cfg.train.use_pallas else "xla"
    metrics = evaluate(state.params, cfg, hashed_eval, cfg.train.batch_size,
                       impl)
    metrics["step"] = int(state.step)
    metrics["impl"] = impl
    print(json.dumps(metrics))
    ckpt.close()


if __name__ == "__main__":
    main()
