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


def _run_workers(num_procs: int, dev_per_proc: int, tmpdir) -> list:
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
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(num_procs), str(pid),
             str(dev_per_proc), str(STEPS), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return [json.load(open(o)) for o in outs]


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
