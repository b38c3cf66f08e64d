"""Round-3 probe #20: what does one dynamic fori_loop iteration cost
inside a Mosaic kernel?

lane_take v2 runs at ~1.3-1.6 us per window-row regardless of dot
dependency structure (indep accumulators: no change). Hypothesis: the
scalar-sequenced dynamic-bound loop iteration itself dominates (the
in-kernel flag scan measured ~2 us/row). Variants, all fori_loop with a
RUNTIME bound from SMEM (n=16384):

  empty   : carry passthrough
  iota    : one-hot build only (iota+cmp+astype)
  dot     : one (14,128)@(128,128) dot on a CONSTANT one-hot
  build+dot: full routing step (build + dot)
  build+dot x4: 4 unrolled steps per iteration (does unrolling amortize
               the per-iteration overhead?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r20.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 14
LANE = 128


def make_kern(variant, unroll):
    def kern(n_ref, win_ref, rel_ref, o_ref):
        n = n_ref[0]
        relb = rel_ref[0:1, :] * jnp.ones((LANE, 1), jnp.float32).astype(
            jnp.int32
        )
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        const_oh = jnp.eye(LANE, dtype=jnp.float32)

        def step(r, acc):
            if variant == "empty":
                return acc
            if variant == "iota":
                ohf = (sub_iota + r == relb).astype(jnp.float32)
                # touch ohf cheaply so it isn't DCE'd: add its first row
                return acc + ohf[0:1, :] * 0.0 + 1.0
            if variant == "dot":
                blk = win_ref[:, (r % 16) * 0, :] * 1.0  # (C, 128)
                return acc + jax.lax.dot_general(
                    blk, const_oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ohf = (sub_iota + r == relb).astype(jnp.float32)
            blk = win_ref[:, 0, :]
            return acc + jax.lax.dot_general(
                blk, ohf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def body(i, acc):
            for k in range(unroll):
                acc = step(i * unroll + k, acc)
            return acc

        acc = jax.lax.fori_loop(
            0, n, body, jnp.zeros((C, LANE), jnp.float32)
        )
        o_ref[...] = acc

    return kern


def bench(variant, unroll, iters=16384):
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(C, 16, LANE)).astype(np.float32))
    rel = jnp.asarray(
        rng.integers(0, 2048, size=(1, LANE)).astype(np.int32)
    )
    n = jnp.asarray([iters // unroll], jnp.int32)
    f = pl.pallas_call(
        make_kern(variant, unroll),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((C, LANE), jnp.float32),
    )
    g = jax.jit(f)
    jax.block_until_ready(g(n, win, rel))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(n, win, rel))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(
        f"{variant:10s} x{unroll}: {t*1e3:8.3f} ms total, "
        f"{t/iters*1e9:8.1f} ns per STEP, "
        f"{t/(iters//unroll)*1e9:8.1f} ns per ITERATION"
    )


def main():
    print("device:", jax.devices()[0])
    for variant in ("empty", "iota", "dot", "build+dot"):
        bench(variant, 1)
    bench("build+dot", 4)
    bench("build+dot", 8)


if __name__ == "__main__":
    main()


def _kern_dyn(n_ref, win_ref, rel_ref, o_ref):
    n = n_ref[0]
    relb = rel_ref[0:1, :] * jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def body(r, acc):
        ohf = (sub_iota + r == relb).astype(jnp.float32)
        blk = win_ref[:, r % 16, :]     # DYNAMIC second-dim read
        return acc + jax.lax.dot_general(
            blk, ohf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    o_ref[...] = jax.lax.fori_loop(0, n, body, jnp.zeros((C, LANE), jnp.float32))


def bench_dyn(iters=16384):
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(C, 16, LANE)).astype(np.float32))
    rel = jnp.asarray(rng.integers(0, 2048, size=(1, LANE)).astype(np.int32))
    n = jnp.asarray([iters], jnp.int32)
    f = pl.pallas_call(
        _kern_dyn,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((C, LANE), jnp.float32),
    )
    g = jax.jit(f)
    jax.block_until_ready(g(n, win, rel))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(n, win, rel))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"dyn-read+build+dot(HIGHEST) x1: {t/iters*1e9:8.1f} ns per step")


bench_dyn()


def _kern_nested(n_ref, win_ref, rel_ref, o_ref, *, inner, when_store, carry6):
    n = n_ref[0]
    relb = rel_ref[0:1, :] * jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def one(r, acc):
        ohf = (sub_iota + r == relb).astype(jnp.float32)
        blk = win_ref[:, r % 16, :]
        return acc + jax.lax.dot_general(
            blk, ohf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def row(jj, carry):
        q = jnp.minimum(jj % 7 + 1, inner)
        acc = jax.lax.fori_loop(0, q, one, jnp.zeros((C, LANE), jnp.float32))
        if when_store:
            half = jj % 2

            @pl.when(half == 0)
            def _():
                o_ref[...] = acc

            @pl.when(half == 1)
            def _():
                o_ref[...] = acc * 2.0
        if carry6:
            a, b, c2, d, e, f2 = carry
            return (a + 1, b + jj, c2 ^ jj, d + 2, e + 3, f2 + jj % 3)
        return carry

    z = jnp.int32(0)
    init = (z, z, z, z, z, z) if carry6 else (z,)
    jax.lax.fori_loop(0, n, row, init)


def bench_nested(inner, when_store, carry6, iters=2436):
    import functools as ft
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.normal(size=(C, 16, LANE)).astype(np.float32))
    rel = jnp.asarray(rng.integers(0, 2048, size=(1, LANE)).astype(np.int32))
    n = jnp.asarray([iters], jnp.int32)
    f = pl.pallas_call(
        ft.partial(_kern_nested, inner=inner, when_store=when_store,
                   carry6=carry6),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((C, LANE), jnp.float32),
    )
    g = jax.jit(f)
    jax.block_until_ready(g(n, win, rel))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(n, win, rel))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"nested inner<={inner} when_store={int(when_store)} "
          f"carry6={int(carry6)}: {t*1e3:7.3f} ms = "
          f"{t/iters*1e9:8.1f} ns per OUTER row")


for inner in (7,):
    for ws in (False, True):
        for c6 in (False, True):
            bench_nested(inner, ws, c6)


def _kern_bigread(n_ref, idx_ref, win_ref, o_ref, *, store_dyn, oslab_ref=None):
    n = n_ref[0]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def row(jj, acc):
        j = (jj * 7) % 16200
        rel = idx_ref[pl.ds(j, 1), :]          # dynamic 1-sublane read, 8.3MB array
        relb = rel * jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
        ohf = (sub_iota == relb).astype(jnp.float32)
        blk = win_ref[:, jj % 16, :]
        acc = acc + jax.lax.dot_general(
            blk, ohf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if store_dyn:
            orow = (jj * 13) % 450

            @pl.when(jj % 2 == 0)
            def _():
                oslab_ref[0, :, orow, :] = acc

            @pl.when(jj % 2 == 1)
            def _():
                oslab_ref[1, :, orow, :] = acc
        return acc

    o_ref[...] = jax.lax.fori_loop(0, n, row, jnp.zeros((C, LANE), jnp.float32))


def bench_bigread(store_dyn, iters=2436):
    import functools as ft
    rng = np.random.default_rng(0)
    idxb = jnp.asarray(rng.integers(0, 128, size=(16200, LANE)).astype(np.int32))
    win = jnp.asarray(rng.normal(size=(C, 16, LANE)).astype(np.float32))
    n = jnp.asarray([iters], jnp.int32)
    scratch = [pltpu.VMEM((2, C, 450, LANE), jnp.float32)] if store_dyn else []

    def kern(n_ref, idx_ref, win_ref, o_ref, *rest):
        _kern_bigread(n_ref, idx_ref, win_ref, o_ref, store_dyn=store_dyn,
                      oslab_ref=rest[0] if rest else None)

    f = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((C, LANE), jnp.float32),
        scratch_shapes=scratch,
    )
    g = jax.jit(f)
    jax.block_until_ready(g(n, idxb, win))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(n, idxb, win))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"bigread store_dyn={int(store_dyn)}: {t*1e3:7.3f} ms = "
          f"{t/iters*1e9:8.1f} ns per row")


bench_bigread(False)
bench_bigread(True)
