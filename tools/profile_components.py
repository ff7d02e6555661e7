"""Component-level timing of the Full-DSSM sparse train step on real TPU.

Profiles the PRODUCTION path: union (joint) dedupe over a shared table —
one gather, one row-selection, one scatter per step.

Methodology notes (hard-won on the axon relay):
  - EVERY timed function donates its carry: a non-donated large buffer is
    re-shipped through the relay each call, which swamps the measurement
    (a 768 MB f32 table reads as ~1 s/call of phantom "compute").
  - Timings force a VALUE fetch (float(...)) — block_until_ready is
    unreliable on the relay.
  - Each stage runs under a K-iteration lax.scan over stacked batches so the
    ~0.8 ms relay dispatch floor divides out.
  - Run ONE config per invocation (arg "f32" or "bf16") and set
    JAX_COMPILATION_CACHE_DIR — cold Pallas compiles are minutes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    from dssm_tpu.config import get_preset, validate
    from dssm_tpu.data import hash_pairs, make_toy_pairs, select_batch
    from dssm_tpu.kernels.dedup_embed import (
        count_matrix, gather_compact, lookup_from_compact, select_rows)
    from dssm_tpu.kernels.pallas_gather import (
        scatter_add_row_groups, scatter_sr_row_groups, sublane_group)
    from dssm_tpu.models import base as model_base
    from dssm_tpu.train.sparse_update import make_sparse_train_step_body
    from dssm_tpu.loss.cosine_softmax import in_batch_loss
    from dssm_tpu.train.state import create_run_state

    cfg = validate(get_preset("full").replace())
    cfg16 = validate(cfg.replace(tower=cfg.tower.replace(table_dtype="bfloat16")))
    # K=256: the relay's 7-13 ms per-dispatch overhead divides to ~40 us/
    # step (vs ~150-200 at K=64) so stage-minus-NULL differences resolve.
    K = 256

    for tag, c in (("f32", cfg), ("bf16", cfg16)):
        if only and tag != only:
            continue
        params = model_base.init_params(c.tower, seed=0)
        table_key = model_base.TABLE_KEY[c.tower.arch]
        tower0 = next(iter(params))
        table = params[tower0][table_key]
        group = sublane_group(table.dtype)
        bs = c.train.batch_size
        pairs = make_toy_pairs(bs, vocab_words=512, seed=0)
        hashed = hash_pairs(pairs, c.tower, c.data)
        if c.data.freq_remap:
            # Production path: frequency-ordered remap packs hot rows into
            # dense group prefixes (set --data.freq_remap=false via preset to
            # profile the unremapped layout).
            from dssm_tpu.data.remap import apply_remap, build_freq_remap

            hashed = apply_remap(hashed,
                                 build_freq_remap(hashed, c.tower.vocab_size))
        batch = select_batch(
            hashed, np.arange(bs), False,
            dedup_unique=c.data.max_unique,
            dedup_group=group,
            dedup_unique_rows=c.data.max_unique_rows,
            dedup_joint=True,
        )
        stacked = {k: jax.device_put(np.repeat(v[None], K, axis=0))
                   for k, v in batch.items()}
        state = create_run_state(c, params)
        compute_dtype = jnp.dtype(c.tower.compute_dtype)
        n_real = len(np.unique(
            batch["uniq"][batch["uniq"] < c.tower.vocab_size // group]))
        print(f"[{tag}] union real groups: {n_real} of "
              f"{batch['uniq'].shape[0]} slots "
              f"(group={group}, u2={batch['sel'].shape[0]})", flush=True)

        def timed(name, body, carry0, iters=2):
            # Donate the carry so the relay never re-ships it. The input
            # buffer is CONSUMED — callers must not reuse carry0; the final
            # carry is returned for chaining.
            fn = jax.jit(lambda carry, xs: jax.lax.scan(body, carry, xs),
                         donate_argnums=(0,))
            carry, ys = fn(carry0, stacked)
            float(jnp.sum(ys))  # force warmup to completion
            t0 = time.perf_counter()
            for _ in range(iters):
                carry, ys = fn(carry, stacked)
            float(jnp.sum(ys))
            dt = (time.perf_counter() - t0) / (iters * K)
            print(f"[{tag}] {name:34s} {dt*1e6:9.1f} us/step", flush=True)
            return carry

        # 0. null stage: measures the per-step floor every stage below
        # carries — the scan iteration + the relay dispatch/fetch overhead
        # divided by K (measured 7-13 ms per call -> 110-200 us/step at
        # K=64, swinging with the tunnel). Quote stages as (raw - null):
        # the r4 stage notes quoted raw numbers from a thin-tunnel session.
        def body_null(carry, b):
            return carry, jnp.sum(b["q_wgt"][0].astype(jnp.float32))

        _null_carry = timed("NULL (scan+relay floor)", body_null,
                            jnp.zeros((8, 128), jnp.float32))

        # Stage inputs, computed before any donation consumes `table`.
        c0 = jax.jit(gather_compact, static_argnums=(2, 3))(
            table, jnp.asarray(batch["uniq"]), group, "pallas")
        u2 = batch["sel"].shape[0]
        # Independent device-side working copy for the chained table stages
        # (the original stays alive inside `state` for the whole-step stage).
        tbl_work = jax.jit(lambda t: t + 0)(table)

        # 1. gather only (ONE union gather serves both towers)
        def body_gather(tbl, b):
            cc = gather_compact(tbl, b["uniq"], group, impl="pallas")
            return tbl, jnp.sum(cc[:, 0])

        tbl_work = timed("gather (union)", body_gather, tbl_work)

        # 1b. row-selection matmul (once)
        def body_sel(cmp, b):
            c2 = select_rows(cmp, b["sel"], compute_dtype)
            return cmp, jnp.sum(c2[:, 0])

        c0 = timed("sel-matmul (once)", body_sel, c0)

        # 1b2. fused joint kernel: select + both count builds + both matmuls
        # in ONE dispatch (kernels/pallas_count.joint_lookup_pallas)
        def body_joint(cmp, b):
            from dssm_tpu.kernels.dedup_embed import joint_lookup_from_compact

            lq, ld = joint_lookup_from_compact(
                cmp, b["sel"], b["q_inv"], b["q_wgt"], b["d_inv"],
                b["d_wgt"], compute_dtype, impl="pallas")
            return cmp, jnp.sum(lq[:, 0]) + jnp.sum(ld[:, 0])

        c0 = timed("joint fused sel+count (Pallas)", body_joint, c0)

        # 1c. count-build + count-matmul both sides (XLA), from compact2
        compact2 = jnp.asarray(
            np.random.default_rng(0).normal(size=(u2, table.shape[1]))
            .astype(np.float32))

        def body_count(c2, b):
            oq = jnp.dot(count_matrix(b["q_inv"], b["q_wgt"], u2,
                                      dtype=compute_dtype),
                         c2.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
            od = jnp.dot(count_matrix(b["d_inv"], b["d_wgt"], u2,
                                      dtype=compute_dtype),
                         c2.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
            return c2, jnp.sum(oq[:, 0]) + jnp.sum(od[:, 0])

        compact2 = timed("count+matmul q+d (XLA)", body_count, compact2)

        # 1d. same via the fused Pallas count kernel
        def body_count_p(c2, b):
            from dssm_tpu.kernels.pallas_count import count_lookup_pallas

            oq = count_lookup_pallas(c2, b["q_inv"], b["q_wgt"])
            od = count_lookup_pallas(c2, b["d_inv"], b["d_wgt"])
            return c2, jnp.sum(oq[:, 0]) + jnp.sum(od[:, 0])

        compact2 = timed("count+matmul q+d (Pallas)", body_count_p, compact2)

        # 2. gather + sel + compact lookups (fwd only)
        def body_lookup(tbl, b):
            cc = gather_compact(tbl, b["uniq"], group, impl="pallas")
            c2 = select_rows(cc, b["sel"], compute_dtype)
            lq = lookup_from_compact(c2, b["q_inv"], b["q_wgt"],
                                     compute_dtype, None, impl="pallas")
            ld = lookup_from_compact(c2, b["d_inv"], b["d_wgt"],
                                     compute_dtype, None, impl="pallas")
            return tbl, jnp.sum(lq[:, 0]) + jnp.sum(ld[:, 0])

        tbl_work = timed("gather + lookup fwd", body_lookup, tbl_work)

        # 3. full fwd (towers + loss), no bwd
        dense = {t: {k: v for k, v in tp.items() if k != table_key}
                 for t, tp in params.items()}

        def fwd(dns, cc, b):
            c2 = select_rows(cc, b["sel"], compute_dtype)
            lq = lookup_from_compact(c2, b["q_inv"], b["q_wgt"],
                                     compute_dtype, None,
                                     impl="pallas").astype(compute_dtype)
            ld = lookup_from_compact(c2, b["d_inv"], b["d_wgt"],
                                     compute_dtype, None,
                                     impl="pallas").astype(compute_dtype)
            q = model_base.embed_from_lookup(dns, c.tower, "q", b, lq,
                                             impl="pallas")
            d = model_base.embed_from_lookup(dns, c.tower, "d", b, ld,
                                             impl="pallas")
            return in_batch_loss(q, d, c.loss.gamma, impl="pallas")

        def body_fwd(tbl, b):
            cc = gather_compact(tbl, b["uniq"], group, impl="pallas")
            loss, aux = fwd(dense, cc, b)
            return tbl, loss

        tbl_work = timed("gather + full fwd", body_fwd, tbl_work)

        # 4. + backward
        def body_fwdbwd(tbl, b):
            cc = gather_compact(tbl, b["uniq"], group, impl="pallas")
            (loss, aux), grads = jax.value_and_grad(
                fwd, argnums=(0, 1), has_aux=True)(dense, cc, b)
            g0 = jax.tree.leaves(grads)[0]
            return tbl, loss + jnp.ravel(g0)[0]

        tbl_work = timed("gather + fwd + bwd", body_fwdbwd, tbl_work)

        # 5. scatter only (ONE union scatter; SR for bf16, add for f32).
        # Padding slots carry the out-of-range sentinel (skipped) with zero
        # vals, as in real training.
        h = table.shape[1]
        g_slots = batch["uniq"].shape[0]
        vals_np = np.random.default_rng(0).normal(
            size=(g_slots * group, h)).astype(np.float32) * 1e-4
        vals_np[n_real * group:] = 0.0
        vals = jax.device_put(vals_np)

        def body_scatter(tbl, b):
            if jnp.dtype(tbl.dtype) == jnp.bfloat16:
                t2 = scatter_sr_row_groups(tbl, b["uniq"], vals, group,
                                           jnp.int32(1))
            else:
                t2 = scatter_add_row_groups(tbl, b["uniq"],
                                            vals.astype(tbl.dtype), group)
            return t2, jnp.float32(0)

        tbl_work = timed("scatter (union)", body_scatter, tbl_work)

        # 6. whole step (reference)
        step_body = make_sparse_train_step_body(c, impl="pallas")

        def body_step(st, b):
            st2, aux = step_body(st, b)
            return st2, aux["loss"]

        timed("WHOLE STEP", body_step, state)


if __name__ == "__main__":
    main()
