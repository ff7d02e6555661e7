"""Faked multi-host (SURVEY.md §5.3): N real processes over
jax.distributed on CPU must produce the same loss curve as a single process
with the same global batch — the 65k-negative path's correctness condition
scaled down (BASELINE.json:11)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")
STEPS = 10


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_procs: int, dev_per_proc: int, tmpdir, steps=STEPS,
                 mp=1, spc=1, workdir="", resume=False,
                 localsel=False) -> list:
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs, outs = [], []
    for pid in range(num_procs):
        out = os.path.join(tmpdir, f"out_{pid}.json")
        outs.append(out)
        args = [sys.executable, WORKER, coordinator, str(num_procs), str(pid),
                str(dev_per_proc), str(steps), out]
        if mp != 1 or spc != 1 or workdir:
            args += [str(mp), str(spc), workdir]
            if resume:
                args.append("resume")
        if localsel:
            args.append("localsel")
        procs.append(subprocess.Popen(
            args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return [json.load(open(o)) for o in outs]


def test_matrix_mp_multistep_checkpoint(tmp_path):
    """The full multi-host matrix in one scenario (VERDICT r1 item 8):
    2 processes x 2 devices, vocab-sharded table (mp=2), 2 steps per
    dispatch (lax.scan), checkpoint saved across processes, then a resumed
    run restores the sharded state and continues from the saved step."""
    work = str(tmp_path / "ckpt_run")
    multi = _run_workers(2, 2, str(tmp_path), steps=8, mp=2, spc=2,
                         workdir=work)
    # Parity across processes and vs a single process with the same global
    # batch and mesh shape.
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=1e-6)
    (tmp_path / "single").mkdir()
    single = _run_workers(1, 4, str(tmp_path / "single"), steps=8, mp=2,
                          spc=2)
    np.testing.assert_allclose(multi[0]["losses"], single[0]["losses"],
                               rtol=1e-5, atol=1e-6)
    assert multi[0]["losses"][-1] < multi[0]["losses"][0]

    # Resume from the cross-process checkpoint and keep training.
    (tmp_path / "resume").mkdir()
    resumed = _run_workers(2, 2, str(tmp_path / "resume"), steps=4, mp=2,
                           spc=2, workdir=work, resume=True)
    assert resumed[0]["start_step"] == 8, resumed[0]
    np.testing.assert_allclose(resumed[0]["losses"], resumed[1]["losses"],
                               rtol=1e-6)
    # Continuity: the resumed run picks up where training left off — its
    # losses stay in the trained regime, not back at the init loss.
    assert resumed[0]["losses"][0] < multi[0]["losses"][0]


def test_two_process_matches_single_process(tmp_path):
    multi = _run_workers(2, 2, str(tmp_path))
    single = _run_workers(1, 4, str(tmp_path / "single")
                          if (tmp_path / "single").mkdir() or True else None)
    # Both processes observe the identical global loss
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=1e-6)
    # Two-process run == one-process run with the same global batch/devices
    np.testing.assert_allclose(multi[0]["losses"], single[0]["losses"],
                               rtol=1e-5, atol=1e-6)
    # And training is actually progressing
    assert multi[0]["losses"][-1] < multi[0]["losses"][0]


def test_local_sel_multiprocess_parity(tmp_path):
    """Per-data-shard slot spaces (sel_local) through the REAL multi-process
    assembly (dist.make_global_batch ships each host's [shards_local, cap]
    rows into the global P(data) array): 2 procs x 2 devices must match
    1 proc x 4 devices exactly — same shard boundaries, same slot spaces."""
    multi = _run_workers(2, 2, str(tmp_path), steps=6, localsel=True)
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=1e-6)
    (tmp_path / "single").mkdir()
    single = _run_workers(1, 4, str(tmp_path / "single"), steps=6,
                          localsel=True)
    np.testing.assert_allclose(multi[0]["losses"], single[0]["losses"],
                               rtol=1e-5, atol=1e-6)
    # Trajectories at batch 32 are noisy; parity (above) is the point.
    # Bit-identical to the plain joint path was verified separately.
    assert all(np.isfinite(multi[0]["losses"]))
