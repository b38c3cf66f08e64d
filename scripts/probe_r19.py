"""Round-3 probe #19: MXU dot cost vs contraction width K.

The lane-route kernel is dot-bound at ~1.5 us per (14,128)@(128,128) —
a fixed per-instruction cost (bf16 measured the same as f32, probe_r18).
If a single (14,K)@(K,128) dot with K = 4*128..32*128 costs much less
than K/128 separate dots, the per-window-row routing cost collapses:
the one-hot over a whole window is one (span*128, 128) matrix and
acc = win.reshape(C, span*128) @ OH.

Also re-checks whether INDEPENDENT 128-wide dots pipeline (4 unrolled
dots into 4 accumulators vs 4 chained).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r19.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kern_k(a_ref, b_ref, o_ref, *, reps: int):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(o_ref))


def _kern_indep(a_ref, b_ref, o_ref, *, reps: int):
    # 4 independent 128-wide dots per iteration, separate accumulators
    def body(i, accs):
        outs = []
        for j in range(4):
            outs.append(accs[j] + jax.lax.dot_general(
                a_ref[:, j * 128:(j + 1) * 128],
                b_ref[j * 128:(j + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        return tuple(outs)
    z = jnp.zeros_like(o_ref)
    accs = jax.lax.fori_loop(0, reps, body, (z, z, z, z))
    o_ref[...] = accs[0] + accs[1] + accs[2] + accs[3]


def run(kern, a, b, reps, m):
    f = pl.pallas_call(
        functools.partial(kern, reps=reps),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
    )
    g = jax.jit(lambda x, y: f(x, y))
    jax.block_until_ready(g(a, b))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(a, b))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    reps = 20000
    for m in (14, 16):
        for k in (128, 256, 512, 1024, 2048, 4096):
            a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
            b = jnp.asarray(
                (rng.random((k, 128)) < 1.0 / k).astype(np.float32)
            )
            t = run(_kern_k, a, b, reps, m)
            per128 = t / reps / (k // 128) * 1e9
            print(
                f"f32 M={m:2d} K={k:5d}: {t/reps*1e9:9.1f} ns/dot "
                f"({per128:7.1f} ns per 128-slice)"
            )
    # independent vs chained at K=512
    m = 14
    a = jnp.asarray(rng.normal(size=(m, 512)).astype(np.float32))
    b = jnp.asarray((rng.random((512, 128)) < 0.002).astype(np.float32))
    t_i = run(_kern_indep, a, b, reps, m)
    print(f"f32 M={m} 4 indep 128-dots: {t_i/reps*1e9:9.1f} ns/iter "
          f"({t_i/reps/4*1e9:7.1f} ns per dot)")


if __name__ == "__main__":
    main()
