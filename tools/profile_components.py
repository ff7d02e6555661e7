"""Component-level timing of the Full-DSSM sparse train step on real TPU.

Times each stage under a K-iteration lax.scan over stacked batches (the same
amortization trick as bench.py's multi-step path, so the axon relay dispatch
floor divides out). Stages nest cumulatively where natural so differences
give per-stage cost.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dssm_tpu.config import get_preset, validate
    from dssm_tpu.data import hash_pairs, make_toy_pairs, select_batch
    from dssm_tpu.kernels.dedup_embed import gather_compact, lookup_from_compact
    from dssm_tpu.kernels.pallas_gather import (
        scatter_sr_row_groups, sublane_group)
    from dssm_tpu.models import base as model_base
    from dssm_tpu.train.sparse_update import make_sparse_train_step_body
    from dssm_tpu.loss.cosine_softmax import in_batch_loss
    from dssm_tpu.train.state import create_run_state

    cfg = validate(get_preset("full").replace())
    cfg16 = validate(cfg.replace(tower=cfg.tower.replace(table_dtype="bfloat16")))
    K = 64

    for tag, c in (("f32", cfg), ("bf16", cfg16)):
        params = model_base.init_params(c.tower, seed=0)
        table_key = model_base.TABLE_KEY[c.tower.arch]
        tower0 = next(iter(params))
        table = params[tower0][table_key]
        group = sublane_group(table.dtype)
        bs = c.train.batch_size
        pairs = make_toy_pairs(bs, vocab_words=512, seed=0)
        hashed = hash_pairs(pairs, c.tower, c.data)
        batch = select_batch(
            hashed, np.arange(bs), False,
            dedup_unique=c.data.max_unique,
            dedup_group=group,
            dedup_unique_rows=c.data.max_unique_rows,
        )
        stacked = {k: jax.device_put(np.repeat(v[None], K, axis=0))
                   for k, v in batch.items()}
        state = create_run_state(c, params)
        compute_dtype = jnp.dtype(c.tower.compute_dtype)

        def timed(name, body, carry0, iters=4):
            fn = jax.jit(lambda carry, xs: jax.lax.scan(body, carry, xs))
            carry, _ = fn(carry0, stacked)
            jax.block_until_ready(carry)
            t0 = time.perf_counter()
            for _ in range(iters):
                carry, _ = fn(carry, stacked)
            leaf = jax.tree.leaves(carry)[0]
            float(jnp.sum(jnp.ravel(leaf)[:1]))
            dt = (time.perf_counter() - t0) / (iters * K)
            print(f"[{tag}] {name:34s} {dt*1e6:9.1f} us/step")
            return dt

        # 1. gather only (both sides)
        def body_gather(tbl, b):
            cq = gather_compact(tbl, b["q_uniq"], group, impl="pallas")
            cd = gather_compact(tbl, b["d_uniq"], group, impl="pallas")
            return tbl, cq[0, 0] + cd[0, 0]

        timed("gather q+d", body_gather, table)

        # 2. gather + compact lookup (fwd only)
        def body_lookup(tbl, b):
            cq = gather_compact(tbl, b["q_uniq"], group, impl="pallas")
            cd = gather_compact(tbl, b["d_uniq"], group, impl="pallas")
            lq = lookup_from_compact(cq, b["q_inv"], b["q_wgt"],
                                     compute_dtype, b.get("q_sel"),
                                     impl="pallas")
            ld = lookup_from_compact(cd, b["d_inv"], b["d_wgt"],
                                     compute_dtype, b.get("d_sel"),
                                     impl="pallas")
            return tbl, lq[0, 0] + ld[0, 0]

        timed("gather + lookup fwd", body_lookup, table)

        # 3. full fwd (towers + loss), no bwd
        dense = {t: {k: v for k, v in tp.items() if k != table_key}
                 for t, tp in params.items()}

        def fwd(dns, cq, cd, b):
            lq = lookup_from_compact(cq, b["q_inv"], b["q_wgt"],
                                     compute_dtype, b.get("q_sel"),
                                     impl="pallas").astype(compute_dtype)
            ld = lookup_from_compact(cd, b["d_inv"], b["d_wgt"],
                                     compute_dtype, b.get("d_sel"),
                                     impl="pallas").astype(compute_dtype)
            q = model_base.embed_from_lookup(dns, c.tower, "q", b, lq,
                                             impl="pallas")
            d = model_base.embed_from_lookup(dns, c.tower, "d", b, ld,
                                             impl="pallas")
            return in_batch_loss(q, d, c.loss.gamma, impl="pallas")

        def body_fwd(tbl, b):
            cq = gather_compact(tbl, b["q_uniq"], group, impl="pallas")
            cd = gather_compact(tbl, b["d_uniq"], group, impl="pallas")
            loss, aux = fwd(dense, cq, cd, b)
            return tbl, loss

        timed("gather + full fwd", body_fwd, table)

        # 4. + backward
        def body_fwdbwd(tbl, b):
            cq = gather_compact(tbl, b["q_uniq"], group, impl="pallas")
            cd = gather_compact(tbl, b["d_uniq"], group, impl="pallas")
            (loss, aux), grads = jax.value_and_grad(
                fwd, argnums=(0, 1, 2), has_aux=True)(dense, cq, cd, b)
            g0 = jax.tree.leaves(grads)[0]
            return tbl, loss + jnp.ravel(g0)[0]

        timed("gather + fwd + bwd", body_fwdbwd, table)

        # 5. scatter only (SR for bf16, add for f32). Padding slots repeat one
        # absent gid, so their vals rows must be ZERO (the RMW kernels require
        # distinct gids wherever vals are nonzero — as in real training).
        h = table.shape[1]
        g_slots = batch["q_uniq"].shape[0]
        vals_np = np.random.default_rng(0).normal(
            size=(g_slots * group, h)).astype(np.float32) * 1e-4
        n_real = min(len(np.unique(batch["q_uniq"])),
                     len(np.unique(batch["d_uniq"])))
        vals_np[n_real * group:] = 0.0
        vals = jax.device_put(vals_np)
        print(f"[{tag}] real groups: q={len(np.unique(batch['q_uniq']))} "
              f"d={len(np.unique(batch['d_uniq']))} of {g_slots} slots")

        def body_scatter(tbl, b):
            if jnp.dtype(tbl.dtype) == jnp.bfloat16:
                t2 = scatter_sr_row_groups(tbl, b["q_uniq"], vals, group,
                                           jnp.int32(1))
                t2 = scatter_sr_row_groups(t2, b["d_uniq"], vals, group,
                                           jnp.int32(2))
            else:
                from dssm_tpu.kernels.pallas_gather import scatter_add_row_groups
                t2 = scatter_add_row_groups(tbl, b["q_uniq"],
                                            vals.astype(tbl.dtype), group)
                t2 = scatter_add_row_groups(t2, b["d_uniq"],
                                            vals.astype(tbl.dtype), group)
            return t2, jnp.float32(0)

        timed("scatter q+d", body_scatter, table)

        # 6. whole step (reference)
        step_body = make_sparse_train_step_body(c, impl="pallas")

        def body_step(st, b):
            st2, aux = step_body(st, b)
            return st2, aux["loss"]

        timed("WHOLE STEP", body_step, state)


if __name__ == "__main__":
    main()
