"""Smoke coverage for the diagnostic tools (VERDICT r3 weak 7): they import
the kernel/data APIs directly, so signature drift must break CI, not rot
silently until the next on-chip debugging session."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_vocab_stats_runs_on_toy_corpus():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "vocab_stats.py"),
         "--max-pairs=512", "--batch=128", "--vocab=30000",
         "--num-batches=2"],
        capture_output=True, timeout=180, env=env, cwd=REPO)
    log = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, log[-2000:]
    assert "suggest data.max_unique" in log
    assert "collision_rate" in log


def test_bench_dma_tiny_interpret():
    """Run the DMA microbench's real code path at tiny shapes in interpret
    mode — catches kernel signature changes (the r2->r3 gather change would
    have surfaced here)."""
    from dssm_tpu.kernels.pallas_gather import force_interpret

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import bench_dma
    finally:
        sys.path.pop(0)
    with force_interpret():
        bench_dma.main(v=1024, h=128, K=2, max_unique=64, iters=1,
                       gps_list=(8,))
