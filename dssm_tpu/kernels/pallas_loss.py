"""Pallas TPU kernel: fused cosine-softmax cross-entropy over in-batch
negatives — the single fused kernel named by BASELINE.json:5(c).

Computes, without materializing the [B, B'] similarity matrix in HBM:

    logits = gamma * qh @ dh.T          (MXU, blockwise)
    nll_i  = logsumexp_j(logits_i) - logits_i[label_i]

via a streaming (online max/sum) log-softmax over column blocks — the
flash-attention recurrence applied to a plain matmul (SURVEY.md §8 hard
part 4). This is what makes the 65k-negative global pool
(BASELINE.json:11) fit: the [8k_local x 65k] logits never hit HBM.

Layout choices, each measured on the v5e at [8192 x 65536] (round-3
ablation; see BUILD_STATUS):
  - the doc pool is transposed ONCE outside the kernels (dt [D, BG]) so
    every blockwise matmul feeds the MXU without a per-step VMEM transpose
    (in-kernel .T cost ~15-20% of kernel time);
  - recall@1 comes from `pos >= running_max`, not a running argmax — the
    blockwise argmax+select tracking alone DOUBLED forward time
    (10.8 -> 5.3 ms);
  - column tiles default to 2048 (vs 512): 4x fewer grid steps and d-block
    DMAs (5.3 -> 3.4 ms).

Backward is two blockwise kernels (dq accumulates over column blocks, dd
over row blocks) re-streaming the same dt and using the saved per-row
logsumexp:

    dlogits = (softmax(logits) - onehot(label)) * g_row
    dq = gamma * dlogits @ dh ;  dd = gamma * dlogits.T @ qh

Both matmuls contract via dot_general dimension numbers against dt/q
directly — no transposed copies anywhere in the backward either.

Batch sizes must divide the tile sizes (all presets are powers of two);
otherwise callers fall back to the XLA composition in loss/cosine_softmax.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dssm_tpu.kernels.pallas_gather import interpret_forced

_ROW_TILE = 512
_COL_TILE = 2048
_NEG_INF = -1e30


def _pick_tile(n: int, cap: int, align: int) -> Optional[int]:
    t = min(cap, n)
    while t >= align and n % t:
        t //= 2
    return t if (t >= align and n % t == 0 and t % align == 0) else None


def _pick_tiles(b: int, bg: int) -> Optional[Tuple[int, int]]:
    tr = _pick_tile(b, _ROW_TILE, 8)
    tc = _pick_tile(bg, _COL_TILE, 128)
    if tr is None or tc is None:
        return None
    return tr, tc


def _fwd_kernel(gamma, tc, q_ref, dt_ref, lab_ref, nll_ref, lse_ref, pos_ref,
                hit_ref, m_sc, s_sc, pos_sc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        s_sc[:] = jnp.zeros_like(s_sc)
        pos_sc[:] = jnp.zeros_like(pos_sc)

    logits = gamma * jnp.dot(
        q_ref[:], dt_ref[:], preferred_element_type=jnp.float32
    )  # [TR, TC]
    tr = logits.shape[0]
    col_ids = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)

    # Streaming logsumexp.
    blk_max = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_sc[:], blk_max)
    s_sc[:] = s_sc[:] * jnp.exp(m_sc[:] - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_sc[:] = m_new

    # Positive logit: exactly one column block contains each row's label.
    onehot = (col_ids == lab_ref[:]).astype(jnp.float32)
    pos_sc[:] = pos_sc[:] + jnp.sum(logits * onehot, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        lse = m_sc[:] + jnp.log(s_sc[:])
        lse_ref[:] = lse
        nll_ref[:] = lse - pos_sc[:]
        pos_ref[:] = pos_sc[:]
        # argmax==label  <=>  the positive attains the global max. Ties favor
        # the model — and unlike continuous-noise ties, EXACT ties do occur in
        # practice (duplicate titles embed bit-identically), so this metric
        # can read higher than a strict argmax-first definition on
        # duplicate-heavy corpora. It matches compute_ranks' strict-inequality
        # ranking (train/eval.py). A running argmax instead costs 2x forward
        # time (measured).
        hit_ref[:] = (pos_sc[:] >= m_sc[:]).astype(jnp.float32)


def _fwd_call(qh, dt, labels, gamma, tr, tc):
    b, d = qh.shape
    bg = dt.shape[1]
    grid = (b // tr, bg // tc)
    out1 = lambda: pl.BlockSpec((tr, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, gamma, tc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out1(), out1(), out1(), out1()),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),  # nll
            jax.ShapeDtypeStruct((b, 1), jnp.float32),  # lse
            jax.ShapeDtypeStruct((b, 1), jnp.float32),  # pos logit
            jax.ShapeDtypeStruct((b, 1), jnp.float32),  # argmax==label
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, 1), jnp.float32),
            pltpu.VMEM((tr, 1), jnp.float32),
            pltpu.VMEM((tr, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * bg * d,
            bytes_accessed=(b * d + bg * d) * 4 + 4 * b * 4,
            transcendentals=b * bg,
        ),
        interpret=interpret_forced(),
    )(qh, dt, labels.reshape(b, 1).astype(jnp.int32))


def _bwd_dq_kernel(gamma, tc, q_ref, dt_ref, lab_ref, lse_ref, g_ref, dq_ref,
                   acc_sc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    logits = gamma * jnp.dot(
        q_ref[:], dt_ref[:], preferred_element_type=jnp.float32
    )
    tr = logits.shape[0]
    p = jnp.exp(logits - lse_ref[:])  # softmax block [TR, TC]
    col_ids = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    dlog = (p - (col_ids == lab_ref[:]).astype(jnp.float32)) * g_ref[:]
    # dq_block += dlog @ dh_block == dlog [TR,TC] x dt [D,TC] contracted on TC.
    acc_sc[:] = acc_sc[:] + gamma * jax.lax.dot_general(
        dlog, dt_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        dq_ref[:] = acc_sc[:]


def _bwd_dd_kernel(gamma, tr, q_ref, dt_ref, lab_ref, lse_ref, g_ref, dd_ref,
                   acc_sc):
    i = pl.program_id(1)  # row blocks iterate innermost here
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    logits = gamma * jnp.dot(
        q_ref[:], dt_ref[:], preferred_element_type=jnp.float32
    )  # [TR, TC]
    trr, tc = logits.shape
    p = jnp.exp(logits - lse_ref[:])
    j = pl.program_id(0)
    col_ids = j * tc + jax.lax.broadcasted_iota(jnp.int32, (trr, tc), 1)
    dlog = (p - (col_ids == lab_ref[:]).astype(jnp.float32)) * g_ref[:]
    # dd_block += dlog.T @ q == dlog [TR,TC] x q [TR,D] contracted on TR.
    acc_sc[:] = acc_sc[:] + gamma * jax.lax.dot_general(
        dlog, q_ref[:].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == ni - 1)
    def _():
        dd_ref[:] = acc_sc[:]


def _bwd_call(qh, dt, labels, gamma, lse, g, tr, tc):
    b, d = qh.shape
    bg = dt.shape[1]
    lab = labels.reshape(b, 1).astype(jnp.int32)
    lse2 = lse.reshape(b, 1)
    g2 = g.reshape(b, 1).astype(jnp.float32)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, gamma, tc),
        grid=(b // tr, bg // tc),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tr, d), jnp.float32)],
        interpret=interpret_forced(),
    )(qh, dt, lab, lse2, g2)

    dd = pl.pallas_call(
        functools.partial(_bwd_dd_kernel, gamma, tr),
        grid=(bg // tc, b // tr),  # col blocks outer, row blocks inner
        in_specs=[
            pl.BlockSpec((tr, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, d), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tc, d), jnp.float32)],
        interpret=interpret_forced(),
    )(qh, dt, lab, lse2, g2)
    return dq, dd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _nll_op(qh, dh, labels, gamma, tr, tc):
    nll, lse, pos, hit = _fwd_call(qh, dh.T, labels, gamma, tr, tc)
    return nll[:, 0], pos[:, 0], hit[:, 0]


def _nll_fwd(qh, dh, labels, gamma, tr, tc):
    dt = dh.T  # one XLA transpose per step; saved for the two bwd kernels
    nll, lse, pos, hit = _fwd_call(qh, dt, labels, gamma, tr, tc)
    return (nll[:, 0], pos[:, 0], hit[:, 0]), (qh, dt, labels, lse)


def _nll_bwd(gamma, tr, tc, residuals, gs):
    qh, dt, labels, lse = residuals
    g_nll, _, _ = gs  # pos/hit outputs are metrics; no grad flows through them
    dq, dd = _bwd_call(qh, dt, labels, gamma, lse, g_nll, tr, tc)
    return dq.astype(qh.dtype), dd.astype(dt.dtype), None


_nll_op.defvjp(_nll_fwd, _nll_bwd)


def in_batch_loss_pallas(
    qh: jax.Array,
    dh: jax.Array,
    gamma: float,
    labels: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Drop-in for loss.cosine_softmax.in_batch_loss_xla."""
    b = qh.shape[0]
    bg = dh.shape[0]
    if labels is None:
        labels = jnp.arange(b, dtype=jnp.int32)
    tiles = _pick_tiles(b, bg)
    if tiles is None:
        from dssm_tpu.loss.cosine_softmax import in_batch_loss_xla

        return in_batch_loss_xla(qh, dh, gamma, labels)
    tr, tc = tiles
    nll, pos, hit = _nll_op(qh, dh, labels, float(gamma), tr, tc)
    loss = jnp.mean(nll)
    aux = {
        "loss": loss,
        "in_batch_recall@1": jnp.mean(hit),
        "pos_cos": jnp.mean(pos) / gamma,
    }
    return loss, aux
