"""Sparse trigram lookup: the first tower layer.

Reference mechanism: `tf.sparse_tensor_dense_matmul(x_sparse, W1)` over a
[B, TRIGRAM_D] CSR batch (SURVEY.md §3.1 row 3, §3.2 row 1 [R-high]). TPU has
no sparse tensors, so the input is the fixed-K encoding (indices[B, K] int32,
weights[B, K] f32, index 0 = padding with weight 0) and the op is a weighted
embedding-sum:

    out[b] = sum_k weights[b, k] * table[indices[b, k]]

which is mathematically x_dense @ table restricted to the K nonzeros.

Two implementations behind one interface:
  - "xla": jnp.take + weighted sum. XLA autodiff gives the scatter-add
    backward for free; on TPU the gather runs through the serial row engine.
  - "pallas": aligned-group DMA gather + one-hot select matmuls
    (kernels/pallas_embed.py) with a custom VJP.

Measured on v5e at Full-DSSM raw shapes (B=1024, K=64, 500k x 384 f32):
XLA 3.36 ms vs pallas 3.97 ms — the per-lookup DMA descriptor count (B*K)
dominates, so `impl="auto"` picks XLA for this RAW-index bag. The actual TPU
fast path is the per-batch dedup pipeline (kernels/dedup_embed.py: compact
group-gather + count-matmul, ~100x fewer DMAs), which the training step uses
whenever the batch carries dedup fields.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def embedding_bag_xla(table: jax.Array, idx: jax.Array, wgt: jax.Array) -> jax.Array:
    """table [V, H], idx [..., K] int32, wgt [..., K] -> [..., H].

    Padding entries carry weight 0 and therefore contribute nothing in either
    direction; the dangling gather of row 0 is harmless.
    """
    rows = jnp.take(table, idx, axis=0)  # [..., K, H]
    return jnp.einsum("...k,...kh->...h", wgt.astype(rows.dtype), rows)


def embedding_bag(
    table: jax.Array,
    idx: jax.Array,
    wgt: jax.Array,
    *,
    impl: str = "auto",
) -> jax.Array:
    # Inside a vocab-sharded training step (parallel/train_step.py installs
    # the context), route through the local-gather + psum shard_map path.
    from dssm_tpu.kernels import sharded_embed

    ctx = sharded_embed.current_context()
    if ctx is not None:
        mesh, model_axis, data_axis, base_impl, _ = ctx
        if mesh.shape[model_axis] > 1:
            return sharded_embed.embedding_bag_sharded(
                table, idx, wgt, mesh, model_axis, data_axis, base_impl
            )
        impl = base_impl
    if impl == "auto":
        impl = "xla"  # raw-index bag: XLA gather wins (module docstring)
    if impl == "xla":
        return embedding_bag_xla(table, idx, wgt)
    if impl == "pallas":
        from dssm_tpu.kernels.pallas_embed import embedding_bag_pallas

        out = embedding_bag_pallas(table, idx, wgt)
        if out is not None:
            return out.astype(table.dtype)
        return embedding_bag_xla(table, idx, wgt)  # unsupported shapes
    raise ValueError(f"unknown impl {impl!r}")


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def embedding_bag_grad_reference(
    g: jax.Array, idx: jax.Array, wgt: jax.Array, vocab_size: int
) -> jax.Array:
    """Reference scatter-add backward (d table), for kernel parity tests:
    dT[v] = sum_{b,k: idx[b,k]=v} wgt[b,k] * g[b]."""
    b, k = idx.shape[-2], idx.shape[-1]
    flat_idx = idx.reshape(-1)
    contrib = (wgt[..., None] * g[..., None, :]).reshape(b * k, -1)
    return jax.ops.segment_sum(contrib, flat_idx, num_segments=vocab_size)
