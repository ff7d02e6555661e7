"""Multi-host worker for the faked multi-host tests (SURVEY.md §5.3) and a
runnable demo of the multi-host path: N processes x M virtual CPU devices,
jax.distributed over a local coordinator, global negative pool across all
N*M devices, global-batch dedupe, per-host data sharding. Options exercise
the full matrix: vocab-sharded tables (mp>1), K-steps-per-dispatch
(steps_per_call>1), and orbax checkpoint save/restore across processes.

    python tools/multihost_worker.py <coordinator> <num_procs> <proc_id> \
        <devices_per_proc> <steps> <out_json> [mp] [steps_per_call] \
        [workdir] [resume]

Writes {"losses": [...], "start_step": S} to out_json.
"""

import json
import os
import sys


def main():
    # "localsel" (anywhere after the positionals) enables the union dedupe +
    # per-data-shard slot spaces (loader.reslot_local) — the multihost
    # count-width optimization — through the REAL multi-process
    # make_global_batch assembly.
    argv = [a for a in sys.argv if a != "localsel"]
    localsel = len(argv) != len(sys.argv)
    coordinator, num_procs, proc_id, dev_per_proc, steps, out_path = argv[1:7]
    num_procs, proc_id = int(num_procs), int(proc_id)
    dev_per_proc, steps = int(dev_per_proc), int(steps)
    mp = int(argv[7]) if len(argv) > 7 else 1
    spc = int(argv[8]) if len(argv) > 8 else 1
    workdir = argv[9] if len(argv) > 9 else ""
    resume = len(argv) > 10 and argv[10] == "resume"

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dev_per_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == num_procs * dev_per_proc

    from dssm_tpu.config import (
        DataConfig, LossConfig, MeshConfig, RunConfig, TowerConfig, TrainConfig,
    )
    from dssm_tpu.data import batch_iterator, hash_pairs, make_toy_pairs
    from dssm_tpu.models import base as model_base
    from dssm_tpu.parallel import dist
    from dssm_tpu.parallel.mesh import make_mesh
    from dssm_tpu.parallel.train_step import (
        create_sharded_state,
        make_parallel_multi_step,
        make_parallel_train_step,
    )
    from dssm_tpu.train.loop import stack_batches

    cfg = RunConfig(
        name="mh-test",
        tower=TowerConfig(vocab_size=4096, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=1024),
        loss=LossConfig(mode="in_batch"),
        mesh=MeshConfig(data_parallel=-1, model_parallel=mp),
        train=TrainConfig(batch_size=32, learning_rate=0.02, use_pallas=False,
                          steps_per_call=spc),
    )
    pairs = make_toy_pairs(256, vocab_words=64, seed=7)
    hashed = hash_pairs(pairs, cfg.tower, cfg.data)
    batches = batch_iterator(
        hashed, cfg.train.batch_size, seed=5,
        process_index=proc_id, process_count=num_procs,
        dedup_unique=cfg.data.max_unique,
        dedup_joint=localsel,
        local_sel_cap=256 if localsel else 0,
        local_sel_shards=max(1, dev_per_proc // mp),
    )
    mesh = make_mesh(cfg.mesh)
    params = model_base.init_params(cfg.tower, seed=0)
    state = create_sharded_state(cfg, mesh, params)

    ckpt = None
    start_step = 0
    if workdir:
        from dssm_tpu.io.checkpoint import Checkpointer

        ckpt = Checkpointer(workdir, keep=2)
        if resume:
            with mesh:
                restored = ckpt.restore(state)
            assert restored is not None, "resume requested, no checkpoint"
            state = restored
            start_step = int(state.step)
            # Fast-forward the (deterministic, shared-seed) batch stream so
            # every host resumes at the same data position.
            for _ in range(start_step):
                next(batches)

    losses = []
    with mesh:
        if spc > 1:
            multi_fn = make_parallel_multi_step(cfg, mesh, impl="xla")
            for _ in range(steps // spc):
                stacked = stack_batches(next(batches) for _ in range(spc))
                stacked = dist.make_global_batch(stacked, mesh, stacked=True)
                state, auxes = multi_fn(state, stacked)
                losses.extend(float(x) for x in auxes["loss"])
        else:
            step_fn = make_parallel_train_step(cfg, mesh, impl="xla")
            for _ in range(steps):
                batch = dist.make_global_batch(next(batches), mesh)
                state, aux = step_fn(state, batch)
                losses.append(float(aux["loss"]))
        if ckpt is not None:
            ckpt.save(int(state.step), state, force=True)
            ckpt.wait()

    with open(out_path, "w") as fh:
        json.dump({"losses": losses, "proc": proc_id,
                   "start_step": start_step}, fh)
    print(f"proc {proc_id} done from step {start_step}: {losses}")


if __name__ == "__main__":
    main()
