"""Compressed host->device wire format (data/loader.compress_wire): the
relay/PCIe transfer is the measured e2e train bottleneck (~70 MB/s effective
through the axon tunnel vs a 0.7 ms device step), so dedup batches ship
without the dead idx fields, with int16 slot indices and uint8 integral
counts. Must be LOSSLESS: identical training trajectory."""

import numpy as np

from dssm_tpu.config import (
    DataConfig, LossConfig, MeshConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as mb
from dssm_tpu.train.loop import make_train_step
from dssm_tpu.train.state import create_state

B = 64


def _cfg():
    return RunConfig(
        tower=TowerConfig(vocab_size=4096, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=2048, max_unique_rows=512),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=B, learning_rate=0.1, use_pallas=False),
    )


def _iters(cfg, compress):
    pairs = toy.make_toy_pairs(256, vocab_words=64, seed=5)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    return loader.batch_iterator(
        hashed, B, False, seed=1,
        dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows,
        dedup_joint=cfg.tower.shared_weights,
        wire_compress=compress,
    )


def test_compress_wire_shapes_and_dtypes():
    cfg = _cfg()
    batch = next(_iters(cfg, True))
    assert "q_idx" not in batch and "d_idx" not in batch
    assert batch["q_inv"].dtype == np.int16
    assert batch["d_inv"].dtype == np.int16
    assert batch["q_wgt"].dtype == np.uint8
    assert batch["d_wgt"].dtype == np.uint8
    assert "uniq" in batch and batch["uniq"].dtype == np.int32
    raw = next(_iters(cfg, False))
    np.testing.assert_array_equal(batch["q_inv"],
                                  raw["q_inv"].astype(np.int16))
    np.testing.assert_array_equal(batch["q_wgt"].astype(np.float32),
                                  raw["q_wgt"])
    # >2.5x fewer bytes on the wire
    assert (sum(v.nbytes for v in batch.values())
            < sum(v.nbytes for v in raw.values()) / 2.5)


def test_compressed_training_trajectory_identical():
    cfg = _cfg()
    losses = {}
    for compress in (False, True):
        it = _iters(cfg, compress)
        state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
        step = make_train_step(cfg, impl="xla")
        ls = []
        for _ in range(4):
            state, aux = step(state, next(it))
            ls.append(float(aux["loss"]))
        losses[compress] = ls
    # Lossless compression: bit-identical inputs after the device-side
    # widening casts -> identical loss trajectory.
    np.testing.assert_array_equal(losses[False], losses[True])


def test_compress_skips_non_integral_weights():
    cfg = _cfg().replace(data=_cfg().data.replace(normalize_counts=True))
    batch = next(_iters(cfg, True))
    assert batch["q_wgt"].dtype == np.float32  # normalized -> not integral
    assert batch["q_inv"].dtype == np.int16  # slots still compress


def test_rotate_mode_with_compressed_wire():
    """Regression (ADVICE r3 high): compress_wire drops q_idx, and
    add_rotation_offsets used to size offsets from it -> KeyError at step 0
    for any dedup + rotate run. It must size from q_wgt instead."""
    from dssm_tpu.train.loop import add_rotation_offsets

    base = _cfg()
    cfg = base.replace(loss=LossConfig(mode="rotate", num_negatives=4))
    batch = next(_iters(cfg, True))
    assert "q_idx" not in batch
    batch = add_rotation_offsets(batch, cfg, step=0)
    assert batch["rot_offsets"].shape == (4,)
    state = create_state(mb.init_params(cfg.tower, seed=0), cfg.train)
    step = make_train_step(cfg, impl="xla")
    state, aux = step(state, batch)
    assert np.isfinite(float(aux["loss"]))


def test_wire_dtypes_stable_across_outlier_batches():
    """Regression (ADVICE r3 low): wire dtypes are fixed once per run from
    corpus/config invariants, so an outlier batch cannot flip the jit dtype
    signature mid-run (stack_batches would silently promote mixed blocks)."""
    cfg = _cfg()
    pairs = toy.make_toy_pairs(256, vocab_words=64, seed=5)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    # Plant one weight that breaks the uint8 bound in a LATE batch position:
    # per-batch logic would ship early batches as uint8, then flip.
    hashed.q_wgt[200, 0] = 300.0
    it = loader.batch_iterator(
        hashed, B, False, seed=1,
        dedup_unique=cfg.data.max_unique,
        dedup_unique_rows=cfg.data.max_unique_rows,
        dedup_joint=cfg.tower.shared_weights,
        wire_compress=True,
    )
    dtypes = [
        {k: v.dtype for k, v in next(it).items()} for _ in range(4)
    ]
    for d in dtypes[1:]:
        assert d == dtypes[0]
    assert dtypes[0]["q_wgt"] == np.float32  # outlier forces f32 for ALL
    assert dtypes[0]["q_inv"] == np.int16  # slot bound is a config invariant
