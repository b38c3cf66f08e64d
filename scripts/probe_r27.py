"""Round-4 probe: lane routing kernel cost after the independent-
accumulator fix in _lane_stream_kernel (the production streaming router).

Measures, amortized K ops per jitted dispatch (the axon tunnel costs
~25-40 ms per dispatch; see docs/KERNELS.md round-3 lessons):
  - lane_take pack at several occupancies (the compact_state direction)
  - lane_scatter pack (the repack_scan direction, cumsum dst)
  - lane_scatter full-occupancy nb-local octant sort (_octant_regroup)

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/probe_r27.py
Env: PR_ROWS (32400), PR_C (14), PR_K (8)
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

from atray_tpu.kernels.lane_pack import (  # noqa: E402
    lane_scatter,
    lane_take,
    pack_indices,
)
from atray_tpu.render.wavefront import _class_rank_dst, _nb_wcap, _NB_ROWS  # noqa: E402


def amortized(fn, cols, idx, k, wcap, anchor=0, scatter=False):
    """Time K chained kernel calls inside ONE jitted dispatch."""

    @jax.jit
    def run(c):
        op = lane_scatter if scatter else lane_take
        for _ in range(k):
            c = op(c, idx, wcap=wcap, anchor_align=anchor)
        return c

    jax.block_until_ready(run(cols))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(cols))
        ts.append(time.perf_counter() - t0)
    return min(ts) / k


def main():
    rows = int(os.environ.get("PR_ROWS", "32400"))
    c = int(os.environ.get("PR_C", "14"))
    k = int(os.environ.get("PR_K", "8"))
    n = rows * 128
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.normal(size=(c, rows, 128)).astype(np.float32))

    print(f"rows={rows} ({n/1e6:.2f}M rays) x {c} planes, K={k}", flush=True)

    for occ in (0.70, 0.25, 0.11, 0.04):
        alive = jnp.asarray(rng.uniform(size=(n,)) < occ)
        idx = pack_indices(alive)
        dt = amortized(fn=None, cols=cols, idx=idx, k=k, wcap=64)
        print(f"lane_take pack occ={occ:5.2f}: {dt*1e3:7.2f} ms/call",
              flush=True)

    for occ in (0.70, 0.11):
        alive = jnp.asarray(rng.uniform(size=(n,)) < occ)
        pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
        dst = jnp.where(alive, pos, -1).astype(jnp.int32)
        dt = amortized(fn=None, cols=cols, idx=dst, k=k, wcap=64,
                       scatter=True)
        print(f"lane_scatter pack occ={occ:5.2f}: {dt*1e3:7.2f} ms/call",
              flush=True)

    # full-occupancy nb-local octant sort (the _octant_regroup map)
    octd = jnp.asarray(rng.integers(0, 8, size=(n,)).astype(np.int32))
    dst = _class_rank_dst(octd, 8, _NB_ROWS * 128)
    dt = amortized(fn=None, cols=cols, idx=dst, k=k, wcap=_nb_wcap(rows),
                   anchor=_NB_ROWS, scatter=True)
    print(f"lane_scatter octant-sort (full occ): {dt*1e3:7.2f} ms/call",
          flush=True)

    # nb-local LIVE octant sort at late-bounce occupancy (repack_scan map)
    alive = jnp.asarray(rng.uniform(size=(n,)) < 0.11)
    dstl, _ = _class_rank_dst(octd, 8, _NB_ROWS * 128, alive=alive)
    dt = amortized(fn=None, cols=cols, idx=dstl, k=k, wcap=_nb_wcap(rows),
                   anchor=_NB_ROWS, scatter=True)
    print(f"lane_scatter live-octant occ=0.11: {dt*1e3:7.2f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
