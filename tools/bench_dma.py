"""Microbench: gather/scatter row-group DMA kernels vs groups_per_step.

Times the kernels in isolation on the real chip (bf16 and f32 Full-DSSM
table shapes) to pick _GROUPS_PER_STEP — more DMAs in flight per grid step
amortizes the per-step start/wait serialization.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(v: int = 500_000 // 8 * 8, h: int = 384, K: int = 64,
         max_unique: int = 8192, iters: int = 3, gps_list=(32, 64, 128, 256)):
    """Defaults reproduce the on-chip microbench; tests call with tiny
    shapes + force_interpret on CPU (tests/test_tools.py) so kernel
    signature drift breaks CI instead of rotting silently."""
    from dssm_tpu.kernels.pallas_gather import (
        gather_row_groups, scatter_add_row_groups, scatter_sr_row_groups,
        sublane_group)

    for dtype in (jnp.bfloat16, jnp.float32):
        group = sublane_group(dtype)
        g_slots = max_unique // group  # max_unique rows / group
        rng = np.random.default_rng(0)
        gids = np.sort(rng.choice(v // group, size=g_slots, replace=False)
                       ).astype(np.int32)
        gids_dev = jax.device_put(jnp.asarray(gids))
        table = jax.device_put(
            jnp.asarray(rng.normal(size=(v, h)).astype(np.float32), dtype))
        vals = jax.device_put(jnp.asarray(
            rng.normal(size=(g_slots * group, h)).astype(np.float32) * 1e-4))
        mb = 2 * g_slots * group * h * jnp.dtype(dtype).itemsize / 1e6

        for gps in gps_list:
            if g_slots % gps:
                continue

            def body_g(tbl, _):
                out = gather_row_groups(tbl, gids_dev, group,
                                        groups_per_step=gps)
                return tbl, jnp.sum(out[:, 0])

            fn = jax.jit(lambda t: jax.lax.scan(body_g, t, None, length=K),
                         donate_argnums=(0,))
            tbl = jax.jit(lambda t: t + 0)(table)
            tbl, ys = fn(tbl)
            float(jnp.sum(ys))
            t0 = time.perf_counter()
            for _ in range(iters):
                tbl, ys = fn(tbl)
            float(jnp.sum(ys))
            dt = (time.perf_counter() - t0) / (iters * K)
            print(f"[{jnp.dtype(dtype).name}] gather  gps={gps:4d} "
                  f"{dt*1e6:8.1f} us  ({mb/dt/1e3:6.1f} GB/s)", flush=True)

            if dtype == jnp.bfloat16:
                def body_s(tbl, _):
                    t2 = scatter_sr_row_groups(tbl, gids_dev, vals, group,
                                               jnp.int32(3),
                                               groups_per_step=gps)
                    return t2, jnp.float32(0)
            else:
                def body_s(tbl, _):
                    t2 = scatter_add_row_groups(
                        tbl, gids_dev, vals.astype(tbl.dtype), group,
                        groups_per_step=gps)
                    return t2, jnp.float32(0)

            fn = jax.jit(lambda t: jax.lax.scan(body_s, t, None, length=K),
                         donate_argnums=(0,))
            tbl = jax.jit(lambda t: t + 0)(table)
            tbl, ys = fn(tbl)
            float(jnp.sum(tbl[int(gids[0]) * group, 0]))
            t0 = time.perf_counter()
            for _ in range(iters):
                tbl, ys = fn(tbl)
            float(jnp.sum(tbl[int(gids[0]) * group, 0]))
            dt = (time.perf_counter() - t0) / (iters * K)
            print(f"[{jnp.dtype(dtype).name}] scatter gps={gps:4d} "
                  f"{dt*1e6:8.1f} us  ({1.5*mb/dt/1e3:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
