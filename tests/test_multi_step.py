"""K-steps-per-dispatch (lax.scan step batching) must be semantically
identical to K sequential single steps — dense, sparse-dedup, and SPMD paths.

The multi-step path exists to amortize per-dispatch host overhead
(train/loop.make_multi_train_step); scan runs the same step body, so any
divergence is a carry/threading bug, not float noise — tolerances are tight.
"""

import jax
import numpy as np
import pytest

from dssm_tpu.config import (
    DataConfig, LossConfig, MeshConfig, RunConfig, TowerConfig, TrainConfig,
)
from dssm_tpu.data import loader, toy
from dssm_tpu.models import base as mb
from dssm_tpu.train.loop import (
    make_multi_train_step, make_train_step, stack_batches,
)
from dssm_tpu.train.state import create_run_state

B, K = 32, 3


def _cfg(**train_kw):
    return RunConfig(
        tower=TowerConfig(vocab_size=2048, embed_width=32, hidden_dims=(24,),
                          semantic_dim=16),
        data=DataConfig(max_trigrams=32, max_unique=1024, max_unique_rows=256),
        loss=LossConfig(mode="in_batch"),
        train=TrainConfig(batch_size=B, learning_rate=0.1, use_pallas=False,
                          **train_kw),
    )


def _batches(cfg, dedup):
    pairs = toy.make_toy_pairs(B * K, vocab_words=64, seed=7)
    hashed = loader.hash_pairs(pairs, cfg.tower, cfg.data)
    return [
        loader.select_batch(
            hashed, np.arange(i * B, (i + 1) * B), False,
            dedup_unique=cfg.data.max_unique if dedup else None,
            dedup_unique_rows=cfg.data.max_unique_rows,
        )
        for i in range(K)
    ]


def _tree_allclose(a, b, atol=1e-6):
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol,
                                   rtol=1e-6)


@pytest.mark.parametrize(
    "train_kw,dedup",
    [
        (dict(sparse_embed_update=False), False),  # dense optax step
        (dict(), True),                            # sparse dedup step (default)
        (dict(), False),                           # sparse non-dedup step
        (dict(table_optimizer="adagrad"), True),   # rowwise-adagrad table
    ],
)
def test_multi_step_matches_sequential(train_kw, dedup):
    cfg = _cfg(**train_kw)
    batches = _batches(cfg, dedup)

    seq_state = create_run_state(cfg, mb.init_params(cfg.tower, seed=0))
    step = make_train_step(cfg, impl="xla")
    seq_losses = []
    for b in batches:
        seq_state, aux = step(seq_state, b)
        seq_losses.append(float(aux["loss"]))

    multi_state = create_run_state(cfg, mb.init_params(cfg.tower, seed=0))
    multi = make_multi_train_step(cfg, impl="xla")
    multi_state, auxes = multi(multi_state, stack_batches(batches))

    assert auxes["loss"].shape == (K,)
    np.testing.assert_allclose(np.asarray(auxes["loss"]), seq_losses, atol=1e-6)
    assert int(multi_state.step) == K
    _tree_allclose(multi_state.params, seq_state.params)
    _tree_allclose(multi_state.opt_state, seq_state.opt_state)


def test_parallel_multi_step_matches_sequential():
    from dssm_tpu.parallel import mesh as mesh_lib
    from dssm_tpu.parallel.train_step import (
        create_sharded_state, make_parallel_multi_step,
        make_parallel_train_step, shard_batch,
    )

    cfg = _cfg().replace(mesh=MeshConfig(data_parallel=8, model_parallel=1))
    batches = _batches(cfg, dedup=True)
    mesh = mesh_lib.make_mesh(cfg.mesh)

    with mesh:
        seq_state = create_sharded_state(cfg, mesh, mb.init_params(cfg.tower, seed=0))
        step = make_parallel_train_step(cfg, mesh, impl="xla")
        seq_losses = []
        for b in batches:
            seq_state, aux = step(seq_state, shard_batch(b, mesh))
            seq_losses.append(float(aux["loss"]))

        multi_state = create_sharded_state(cfg, mesh, mb.init_params(cfg.tower, seed=0))
        multi = make_parallel_multi_step(cfg, mesh, impl="xla")
        stacked = shard_batch(stack_batches(batches), mesh, stacked=True)
        multi_state, auxes = multi(multi_state, stacked)

    np.testing.assert_allclose(np.asarray(auxes["loss"]), seq_losses, atol=1e-6)
    _tree_allclose(multi_state.params, seq_state.params)


def test_train_driver_steps_per_call():
    """train() with steps_per_call>1 (incl. ragged tail) reaches the same
    state as steps_per_call=1 on the same batch stream."""
    from dssm_tpu.train.loop import train

    def run(k):
        cfg = _cfg(steps_per_call=k)
        batches = iter(_batches(cfg, dedup=True) * 3)
        state = create_run_state(cfg, mb.init_params(cfg.tower, seed=0))
        return train(cfg, state, batches, num_steps=5)  # 5 = 2*2 + tail 1

    s1, s2 = run(1), run(2)
    assert int(s2.step) == 5
    _tree_allclose(s1.params, s2.params)
