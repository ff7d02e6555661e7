"""Failure recovery (SURVEY.md §6.3): SIGKILL a training process mid-run,
restart with --resume, and assert the run continues from the last checkpoint
rather than from scratch."""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


def _cli(workdir, max_steps):
    return [
        sys.executable, "-m", "dssm_tpu.cli.train",
        "--preset=tiny", "--cpu", "--resume",
        "--tower.vocab_size=5000", "--tower.embed_width=64",
        "--tower.hidden_dims=48", "--tower.semantic_dim=32",
        "--data.toy_num_pairs=512", "--data.max_unique=2048",
        "--train.batch_size=64", f"--train.max_steps={max_steps}",
        "--train.checkpoint_every=5", "--train.eval_every=0",
        "--train.log_every=5", f"--io.workdir={workdir}",
    ]


def test_sigkill_and_resume(tmp_path):
    workdir = str(tmp_path / "run")
    proc = subprocess.Popen(_cli(workdir, 400), env=_env(),
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    # Wait until at least one checkpoint lands, then SIGKILL mid-run.
    ckpt_dir = os.path.join(workdir, "checkpoints")
    deadline = time.time() + 240
    seen = []
    while time.time() < deadline:
        if os.path.isdir(ckpt_dir):
            seen = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
            if seen:
                break
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise AssertionError(f"trainer exited early:\n{out[-3000:]}")
        time.sleep(0.5)
    assert seen, "no checkpoint appeared within deadline"
    time.sleep(1.0)
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # Restart with a short remaining budget; it must resume, not start over.
    out = subprocess.run(_cli(workdir, 30), env=_env(), capture_output=True,
                         timeout=240)
    log = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, log[-3000:]
    assert "resumed from step" in log, log[-3000:]
    resumed_step = int(log.split("resumed from step ")[1].split()[0])
    assert resumed_step >= 5

    # Metrics file shows training records from both incarnations.
    records = [json.loads(l) for l in
               open(os.path.join(workdir, "metrics.jsonl"))]
    train_steps = [r["step"] for r in records if r["tag"] == "train"]
    assert len(train_steps) >= 2


def test_sigkill_resume_data_stream_continuity(tmp_path):
    """Data cursor (SURVEY.md §6.4, VERDICT r5 item 2): the resumed run must
    continue the EXACT data stream the killed run left — per-step losses
    after resume equal an unkilled fixed-seed run's at the same steps. The
    r4 behavior (fresh iterator restarting at epoch 0 batch 0 while the step
    counter continued) produced different batches and fails this."""
    work = str(tmp_path / "killed")
    proc = subprocess.Popen(
        _cli(work, 400) + ["--train.log_every=1"], env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    ckpt_dir = os.path.join(work, "checkpoints")
    deadline = time.time() + 240
    seen = []
    while time.time() < deadline:
        if os.path.isdir(ckpt_dir):
            seen = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
            if seen:
                break
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise AssertionError(f"trainer exited early:\n{out[-3000:]}")
        time.sleep(0.5)
    assert seen, "no checkpoint appeared within deadline"
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    latest = max(int(d) for d in
                 os.listdir(ckpt_dir) if d.isdigit())
    target = latest + 15  # guaranteed overlap window after the resume point

    out = subprocess.run(_cli(work, target) + ["--train.log_every=1"],
                         env=_env(), capture_output=True, timeout=240)
    log = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, log[-3000:]
    assert "resumed from step" in log, log[-3000:]
    resumed_step = int(log.split("resumed from step ")[1].split()[0])

    # Unkilled reference run: same seed/config, fresh workdir, same budget.
    ref = str(tmp_path / "ref")
    out2 = subprocess.run(_cli(ref, target) + ["--train.log_every=1"],
                          env=_env(), capture_output=True, timeout=240)
    assert out2.returncode == 0, (out2.stdout + out2.stderr).decode()[-3000:]

    def losses(workdir):
        got = {}
        for line in open(os.path.join(workdir, "metrics.jsonl")):
            r = json.loads(line)
            if r["tag"] == "train":
                got[r["step"]] = r["loss"]  # later incarnations overwrite
        return got

    killed, unkilled = losses(work), losses(ref)
    overlap = sorted(s for s in killed
                     if s in unkilled and s >= resumed_step)
    assert len(overlap) >= 5, (resumed_step, sorted(killed), sorted(unkilled))
    for s in overlap:
        assert killed[s] == unkilled[s], (
            f"step {s}: resumed loss {killed[s]} != unkilled {unkilled[s]} "
            "— the resumed run is not continuing the checkpointed data "
            "stream")


def test_stacked_tail_steps(tmp_path):
    """Regression (ADVICE r3 medium): with steps_per_call>1 and a max_steps
    that is NOT a multiple of it, the tail single-steps pull from the same
    prefetch stream the stacked-block worker thread is advancing; without
    LockedIterator this intermittently died with 'generator already
    executing' at end of training."""
    workdir = str(tmp_path / "run")
    cli = _cli(workdir, 23)  # 23 = 5 blocks of 4 + 3 tail singles
    cli += ["--train.steps_per_call=4", "--train.checkpoint_every=0"]
    out = subprocess.run(cli, env=_env(), capture_output=True, timeout=240)
    log = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, log[-3000:]
    assert "generator already executing" not in log
    assert "final eval" in log


def test_checkpoint_overwrites_stale_same_step(tmp_path):
    """A fresh (non --resume) run into a workdir holding an older checkpoint
    at the same step must overwrite it, not crash with
    StepAlreadyExistsError at the final save (r5 verify finding)."""
    import jax.numpy as jnp

    from dssm_tpu.io.checkpoint import Checkpointer
    from dssm_tpu.train.state import TrainState

    def state(v):
        return TrainState(step=jnp.int32(7),
                          params={"shared": {"W0": jnp.full((4, 4), v)}},
                          opt_state=())

    ck = Checkpointer(str(tmp_path), keep=2, async_save=False)
    assert ck.save(7, state(1.0), force=True)
    ck.wait()
    ck.close()

    ck2 = Checkpointer(str(tmp_path), keep=2, async_save=False)
    assert ck2.save(7, state(2.0), force=True)  # same step, fresh run
    ck2.wait()
    got = ck2.restore(state(0.0))
    assert float(got.params["shared"]["W0"][0, 0]) == 2.0
    ck2.close()


def test_fresh_run_clears_stale_later_checkpoints(tmp_path):
    """A fresh (non --resume) run into a workdir holding checkpoints at
    LATER steps must clear them — otherwise orbax's latest-step gate
    silently suppresses every intermediate save and a later --resume
    restores the old run's weights (r5 review finding)."""
    workdir = str(tmp_path / "run")

    def cli(max_steps, resume):
        args = [a for a in _cli(workdir, max_steps) if a != "--resume"]
        if resume:
            args.append("--resume")
        return args

    out = subprocess.run(cli(30, resume=False), env=_env(),
                         capture_output=True, timeout=240)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    ckpt_dir = os.path.join(workdir, "checkpoints")
    assert "30" in os.listdir(ckpt_dir)

    # Fresh run with a SMALLER budget: old step-30 checkpoint must go, and
    # the new run must write its own checkpoints.
    out = subprocess.run(cli(10, resume=False), env=_env(),
                         capture_output=True, timeout=240)
    log = (out.stdout + out.stderr).decode()
    assert out.returncode == 0, log[-2000:]
    assert "clearing" in log
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert steps and max(steps) == 10, steps
