"""Round-3 probe #17: lane-pack economics on the real chip.

Times kernels/lane_pack.lane_take against the XLA alternatives at the
production bounce-2 shape (2.07M rays x 14 state columns) across the
occupancies the frame actually sees (b2 ~15%, b3 ~7%, b4 ~3.5%):

  - lane_take (banded one-hot matmul kernel), wcap matched to occupancy
  - XLA flat gather  out[:, i] = flat[:, idx[i]]
  - the round-2 verdict baseline: per-ray argsort + 14-column take

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r17.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ATRAY_JAX_CACHE", os.path.expanduser("~/.cache/jax_atray")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from atray_tpu.kernels.lane_pack import lane_take, pack_indices

LANE = 128
ROWS = 16200               # 2.0736M rays
N = ROWS * LANE
C = 14


def bench(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(C, ROWS, LANE)).astype(np.float32))

    for occ, wcap in [(0.15, 16), (0.07, 32), (0.035, 64)]:
        alive = jnp.asarray(rng.random(N) < occ)
        pidx = jax.jit(pack_indices)(alive)
        n_live = int(jnp.sum(alive))

        # fresh cols per timed call (relay caches identical dispatches)
        def with_salt(fn):
            def g(salt):
                return fn(base + salt * 1e-12)
            return jax.jit(g)

        f_kern = with_salt(lambda c: lane_take(c, pidx, wcap=wcap))
        t_kern = min(
            bench(f_kern, jnp.float32(s), reps=2) for s in (1.0, 2.0)
        )

        def xla_gather(c):
            flat = c.reshape(C, N)
            safe = jnp.clip(pidx, 0, N - 1)
            out = flat[:, safe] * (pidx >= 0)[None, :].astype(jnp.float32)
            return out.reshape(C, ROWS, LANE)

        f_x = with_salt(xla_gather)
        t_x = min(bench(f_x, jnp.float32(s), reps=2) for s in (1.0, 2.0))

        print(
            f"occ={occ:5.3f} live={n_live:7d} wcap={wcap:2d}: "
            f"lane_take {t_kern*1e3:7.1f} ms | XLA gather {t_x*1e3:7.1f} ms"
            f" | speedup {t_x/t_kern:5.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
