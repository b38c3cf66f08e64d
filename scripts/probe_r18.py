"""Round-3 probe #18: can Mosaic contract the RHS on dim 1 (B^T matmul)?

The scatter-style lane-routing kernel builds the one-hot with the routing
values in LANES (cheap) — which yields M = OH^T. Using it directly needs
out = win @ M^T, i.e. dot_general(((1,), (1,)), ...). If Mosaic lowers
that natively the scatter mode costs the same as the gather mode; if not
we need a (128,128) in-kernel transpose per window row.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r18.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern_t(a_ref, b_ref, o_ref, *, reps: int):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(o_ref))


def _kern_n(a_ref, b_ref, o_ref, *, reps: int):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(o_ref))


def run(kern, a, b, reps):
    f = pl.pallas_call(
        functools.partial(kern, reps=reps),
        out_shape=jax.ShapeDtypeStruct((a.shape[0], 128), jnp.float32),
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
    a = jnp.asarray(rng.normal(size=(14, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    reps = 20000

    # correctness first
    f_t = pl.pallas_call(
        functools.partial(_kern_t, reps=1),
        out_shape=jax.ShapeDtypeStruct((14, 128), jnp.float32),
    )
    got = f_t(a, b)
    want = a @ b.T
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"B^T matmul max err vs a@b.T: {err:.2e}")

    t_n = run(_kern_n, a, b, reps)
    t_t = run(_kern_t, a, b, reps)
    print(f"normal  (((1,),(0,))): {t_n/reps*1e9:8.1f} ns/dot")
    print(f"rhs-T   (((1,),(1,))): {t_t/reps*1e9:8.1f} ns/dot")


if __name__ == "__main__":
    main()


def _kern_bf16(a_ref, b_ref, o_ref, *, reps: int):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(o_ref))


def main2():
    rng = np.random.default_rng(1)
    reps = 20000
    for m in (14, 56):
        a = jnp.asarray(rng.normal(size=(m, 128)).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray((rng.random((128, 128)) < 0.01).astype(np.float32)).astype(jnp.bfloat16)
        f = pl.pallas_call(
            functools.partial(_kern_bf16, reps=reps),
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        )
        g = jax.jit(lambda x, y: f(x, y))
        jax.block_until_ready(g(a, b))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(g(a, b))
            ts.append(time.perf_counter() - t0)
        print(f"bf16 M={m:3d} dot: {min(ts)/reps*1e9:8.1f} ns/dot")


main2()
