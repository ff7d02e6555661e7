"""Training entry point.

Reference: `python dssm.py` with ~6 tf.app.flags (SURVEY.md §4.1). Here:

    python -m dssm_tpu.cli.train --preset=tiny [--cpu] [--resume] \
        [--train.max_steps=1000] [--train.learning_rate=0.05] [...]

Any config field is overridable with --section.field=value (types coerced
from the dataclass defaults). Writes JSONL metrics + orbax checkpoints under
--io.workdir; evaluates Recall@1/NDCG@10 every train.eval_every steps.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, List, Optional, Tuple


def parse_argv(argv: List[str]) -> Tuple[str, bool, bool, Dict[str, str]]:
    preset, cpu, resume = "tiny", False, False
    overrides: Dict[str, str] = {}
    for arg in argv:
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument {arg!r}; use --key=value")
        body = arg[2:]
        if body == "cpu":
            cpu = True
        elif body == "resume":
            resume = True
        elif body.startswith("preset="):
            preset = body.split("=", 1)[1]
        elif "=" in body:
            k, v = body.split("=", 1)
            overrides[k] = v
        else:
            raise SystemExit(f"unknown flag {arg!r}")
    return preset, cpu, resume, overrides


def coerce_overrides(cfg, overrides: Dict[str, str]):
    """Coerce string values to each field's current type, then apply."""
    from dssm_tpu.config import apply_overrides

    typed = {}
    for key, raw in overrides.items():
        node = cfg
        for part in key.split("."):
            node = getattr(node, part)  # raises AttributeError for bad keys
        if isinstance(node, bool):
            typed[key] = raw.lower() in ("1", "true", "yes")
        elif isinstance(node, int):
            typed[key] = int(raw)
        elif isinstance(node, float):
            typed[key] = float(raw)
        elif isinstance(node, tuple):
            typed[key] = tuple(int(x) for x in raw.split(",") if x)
        else:
            typed[key] = raw
    return apply_overrides(cfg, typed)


def main(argv: Optional[List[str]] = None) -> None:
    preset, cpu, resume, raw_overrides = parse_argv(
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
    from dssm_tpu.data import (
        batch_iterator, hash_pairs, make_toy_pairs, train_eval_split,
    )
    from dssm_tpu.io.checkpoint import Checkpointer
    from dssm_tpu.io.metrics import MetricsWriter
    from dssm_tpu.kernels.pallas_gather import sublane_group
    from dssm_tpu.models import base as model_base
    from dssm_tpu.parallel import dist
    from dssm_tpu.parallel.mesh import make_mesh
    from dssm_tpu.parallel.train_step import (
        create_sharded_state, make_parallel_multi_step, make_parallel_train_step,
    )
    from dssm_tpu.train.eval import evaluate
    from dssm_tpu.train.loop import (
        add_rotation_offsets, make_multi_train_step, make_train_step,
        stack_batches,
    )
    from dssm_tpu.train.state import create_run_state
    from dssm_tpu.train.sparse_update import uses_sparse_update

    dist.initialize()
    from dssm_tpu.config import validate as validate_cfg

    cfg = validate_cfg(coerce_overrides(get_preset(preset), raw_overrides))
    if cfg.io.debug_nans:
        jax.config.update("jax_debug_nans", True)
        print("sanitizer: jax_debug_nans enabled (steps serialize; "
              "FloatingPointError at the first NaN/Inf-producing op)",
              file=sys.stderr)
    devices = jax.devices()
    multi_device = len(devices) > 1 or cfg.mesh.model_parallel > 1
    print(f"preset={cfg.name} devices={len(devices)}x{devices[0].platform} "
          f"hosts={jax.process_count()} multi_device={multi_device}",
          file=sys.stderr)

    if cfg.data.path:
        # Real corpus from a TSV/JSONL file (data/corpus.py), hashed in
        # chunks through the C++ data-plane.
        from dssm_tpu.data import load_file_corpus

        hashed_train, hashed_eval, _, _ = load_file_corpus(
            cfg.tower, cfg.data)
        print(f"corpus {cfg.data.path}: {len(hashed_train)} train / "
              f"{len(hashed_eval)} eval pairs", file=sys.stderr)
    else:
        # The synthetic toy clickthrough corpus.
        pairs = make_toy_pairs(cfg.data.toy_num_pairs,
                               cfg.data.toy_vocab_words, cfg.data.seed)
        train_pairs, eval_pairs = train_eval_split(
            pairs, eval_frac=cfg.data.eval_frac, seed=cfg.data.seed)
        hashed_train = hash_pairs(train_pairs, cfg.tower, cfg.data)
        hashed_eval = hash_pairs(eval_pairs, cfg.tower, cfg.data)

    if cfg.data.freq_remap:
        # Frequency-ordered vocab remap (data/remap.py): pack Zipf-hot rows
        # into dense row-group prefixes so the dedup gather/scatter pays far
        # fewer group DMAs. Deterministic from the train corpus (identical on
        # every host); persisted so cli/eval + cli/export apply the same
        # permutation against the trained table.
        from dssm_tpu.data.remap import apply_remap, build_freq_remap, save_remap

        remap = build_freq_remap(hashed_train, cfg.tower.vocab_size,
                                 num_shards=cfg.mesh.model_parallel)
        hashed_train = apply_remap(hashed_train, remap)
        hashed_eval = apply_remap(hashed_eval, remap)
        if jax.process_index() == 0:
            save_remap(cfg.io.workdir, remap)
        print("freq_remap: vocab permutation built from the train corpus "
              f"({cfg.mesh.model_parallel} shard stripes), saved to "
              f"{cfg.io.workdir}", file=sys.stderr)

    params = model_base.init_params(cfg.tower, seed=cfg.train.seed)
    table_dtype = params[next(iter(params))][
        model_base.TABLE_KEY[cfg.tower.arch]].dtype
    dedup = cfg.data.dedup_lookup and uses_sparse_update(cfg)

    writer = MetricsWriter(
        f"{cfg.io.workdir}/{cfg.io.metrics_file}",
        tensorboard_dir=(f"{cfg.io.workdir}/tb" if cfg.io.tensorboard else None),
    )
    # Fresh run (no --resume) into a workdir with existing checkpoints:
    # clear them. Stale LATER-step checkpoints would make orbax skip every
    # intermediate save (latest_step >= step) and a subsequent --resume
    # would silently restore the OLD run's weights.
    if not resume:
        import os as _os
        import shutil as _shutil

        _ckpt_dir = _os.path.join(cfg.io.workdir, "checkpoints")
        if (_os.path.isdir(_ckpt_dir)
                and any(d.isdigit() for d in _os.listdir(_ckpt_dir))):
            if jax.process_index() == 0:
                print("WARNING: fresh run (no --resume) into a workdir "
                      f"with existing checkpoints — clearing {_ckpt_dir} "
                      "(stale checkpoints would suppress saves and poison "
                      "a later --resume). Pass --resume to continue the "
                      "previous run instead.", file=sys.stderr)
                _shutil.rmtree(_ckpt_dir)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("ckpt_clear")
    ckpt = Checkpointer(cfg.io.workdir, keep=cfg.train.keep_checkpoints)

    spc = cfg.train.steps_per_call
    if multi_device:
        mesh = make_mesh(cfg.mesh)
        state = create_sharded_state(cfg, mesh, params)
        step_fn = make_parallel_train_step(cfg, mesh)
        multi_fn = make_parallel_multi_step(cfg, mesh) if spc > 1 else None
        ctx = mesh
    else:
        import contextlib

        mesh = None
        state = create_run_state(cfg, params)
        step_fn = make_train_step(cfg)
        multi_fn = make_multi_train_step(cfg) if spc > 1 else None
        ctx = contextlib.nullcontext()

    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(state.step)}", file=sys.stderr)

    start_step = int(state.step)
    # Data cursor (SURVEY.md §6.4, VERDICT r5 item 2): every step consumes
    # exactly one batch, so the number of batches the previous incarnation
    # consumed IS the restored step count; the iterator fast-forwards by
    # index math on the deterministic permutation (loader.batch_iterator).
    batches = batch_iterator(
        hashed_train,
        cfg.train.batch_size,
        cfg.tower.is_sequence_model,
        seed=cfg.train.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        dedup_unique=cfg.data.max_unique if dedup else None,
        dedup_group=sublane_group(table_dtype),
        dedup_unique_rows=cfg.data.max_unique_rows,
        dedup_joint=cfg.tower.shared_weights,
        # Compressed wire format (drop dead idx fields, int16 slots, uint8
        # counts): host->device transfer is the e2e bottleneck (loader.
        # compress_wire); sequence batches keep their full layout.
        wire_compress=dedup and not cfg.tower.is_sequence_model,
        # Cluster short rows into the same kernel tiles so the count build's
        # K unroll stops early (loader.sort_batch_rows); rotate mode keeps
        # corpus order (its offsets address rows positionally).
        sort_rows=(dedup and not cfg.tower.is_sequence_model
                   and cfg.loss.mode != "rotate"),
        pipeline_workers=cfg.data.pipeline_workers,
        # Third dedupe level: one slot space per LOCAL data shard (this
        # host's devices on the mesh data axis). Only sound when each host
        # owns whole data-axis coordinates (local devices divisible by mp);
        # with mp spanning hosts the per-host shard count is ill-defined, so
        # fall back to the global sel.
        local_sel_cap=(cfg.data.max_unique_rows_local
                       if dedup and cfg.tower.shared_weights
                       and jax.local_device_count()
                       % cfg.mesh.model_parallel == 0 else 0),
        local_sel_shards=max(1, jax.local_device_count()
                             // cfg.mesh.model_parallel),
        start_batch=start_step,
        reshuffle_each_epoch=cfg.data.reshuffle_each_epoch,
        cache_epoch_batches=cfg.data.cache_epoch_batches,
    )
    from dssm_tpu.data import prefetch
    from dssm_tpu.data.loader import LockedIterator

    # LockedIterator: the stacked-block worker thread (below) and the main
    # loop's tail path can both pull from this stream concurrently; bare
    # generators raise 'generator already executing' on that race.
    batches = LockedIterator(prefetch(batches, depth=2))
    # Eval rides the training fast path (dedup compact-gather + Pallas
    # kernels); tail batches are padded to one jit specialization
    # (train/eval.py), so no shape-driven fallback is needed.
    impl_eval = "auto" if cfg.train.use_pallas else "xla"
    profiling = profiled = False
    # Bounded async-dispatch window (train.max_inflight_steps): blocks on the
    # oldest queued step's loss so the device queue can't grow unboundedly.
    from collections import deque

    inflight: "deque" = deque()

    # K-step blocks are stacked AND device-transferred in a background
    # thread: the H2D transfer is the dominant e2e cost (measured ~70 MB/s
    # effective through the relay vs a sub-ms device step), so it must
    # overlap the previous block's compute. Rotate mode keeps the inline
    # path (its offsets depend on the live step counter).
    stacked_blocks = None
    if multi_fn is not None and cfg.loss.mode != "rotate":
        def _stacked_stream():
            while True:
                blk = stack_batches(next(batches) for _ in range(spc))
                if multi_device:
                    blk = dist.make_global_batch(blk, mesh, stacked=True)
                else:
                    blk = jax.device_put(blk)
                yield blk

        stacked_blocks = prefetch(_stacked_stream(), depth=2)

    with ctx:
        t_last = time.perf_counter()
        step = last_log_step = start_step
        while step < cfg.train.max_steps:
            # Profiler hook (SURVEY.md §6.1): trace a warm window of steps.
            if (cfg.io.profile_dir and not profiling and not profiled
                    and step >= start_step + 5):
                jax.profiler.start_trace(cfg.io.profile_dir)
                profiling = True
            if profiling and step >= start_step + 10:
                jax.profiler.stop_trace()
                profiling, profiled = False, True
                print(f"profile written to {cfg.io.profile_dir}",
                      file=sys.stderr)
            if multi_fn is not None and cfg.train.max_steps - step >= spc:
                # K steps fused into one dispatch (train.loop docstring).
                if stacked_blocks is not None:
                    stacked = next(stacked_blocks)
                else:
                    stacked = stack_batches(
                        add_rotation_offsets(next(batches), cfg, step + j)
                        for j in range(spc)
                    )
                    if multi_device:
                        stacked = dist.make_global_batch(stacked, mesh,
                                                         stacked=True)
                state, auxes = multi_fn(state, stacked)
                aux = {k: v[-1] for k, v in auxes.items()}
                step += spc - 1  # log/eval/ckpt below act on the LAST step
            else:
                batch = add_rotation_offsets(next(batches), cfg, step)
                if multi_device:
                    batch = dist.make_global_batch(batch, mesh)
                state, aux = step_fn(state, batch)
            inflight.append(aux["loss"])
            while len(inflight) > cfg.train.max_inflight_steps:
                inflight.popleft().block_until_ready()
            stride = spc if multi_fn is not None else 1
            if step % cfg.train.log_every < stride:
                now = time.perf_counter()
                metrics = {k: float(v) for k, v in aux.items()}
                metrics["steps_per_sec"] = (
                    (step - last_log_step) / (now - t_last)
                    if step > last_log_step else 0.0
                )
                metrics["pairs_per_sec"] = (
                    metrics["steps_per_sec"] * cfg.train.batch_size
                )
                t_last, last_log_step = now, step
                writer.write("train", step, metrics)
                print(f"step {step}: loss={metrics['loss']:.4f} "
                      f"r@1={metrics['in_batch_recall@1']:.3f}",
                      file=sys.stderr)
            if (cfg.train.eval_every and step
                    and step % cfg.train.eval_every < stride):
                ev = evaluate(state.params, cfg, hashed_eval,
                              cfg.train.batch_size, impl_eval)
                writer.write("eval", step, ev)
                if cfg.io.tensorboard:
                    from dssm_tpu.io.metrics import weight_summaries

                    writer.write("weights", step,
                                 weight_summaries(
                                     state.params,
                                     cfg.io.weight_histogram_bins))
                print(f"eval@{step}: recall@1={ev['recall@1']:.3f} "
                      f"ndcg@10={ev['ndcg@10']:.3f}", file=sys.stderr)
            if (cfg.train.checkpoint_every and step
                    and step % cfg.train.checkpoint_every < stride):
                ckpt.save(step, state)
            step += 1

        ckpt.save(cfg.train.max_steps, state, force=True)
        ckpt.wait()
        ev = evaluate(state.params, cfg, hashed_eval, cfg.train.batch_size,
                      impl_eval)
        writer.write("eval_final", cfg.train.max_steps, ev)
        print(f"final eval: recall@1={ev['recall@1']:.3f} "
              f"ndcg@10={ev['ndcg@10']:.3f} mrr={ev['mrr']:.3f}",
              file=sys.stderr)
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main()
