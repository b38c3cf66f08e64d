"""Decompose compaction costs on the real chip (not part of the bench).

Measures, with amortized multi-iteration dispatches (>> the ~24 ms relay
constant — see bench.py methodology):
  1. argsort of int32 keys at N rays
  2. permutation APPLY (14-channel row gather)
  3. lax.sort multi-operand (key + channels in one fused sort)
  4. fused-kernel traversal throughput on REAL bounce-1 rays:
     unsorted vs octant+cell-sorted vs fully-dead-parked

Run: python scripts/probe_compaction.py  [N_RAYS=2073600]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ATRAY_JAX_CACHE", os.path.expanduser("~/.cache/jax_atray")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atray_tpu.accel.shaded import build_shaded_accel
from atray_tpu.config import KDTreeConfig
from atray_tpu.core.camera import camera_rays, look_at_camera
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import to_tile_order, _bounce_dir, ray_uniforms
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import make_materials
from atray_tpu.scene.transforms import translate


def timeit(fn, *a, iters=8, label=""):
    """Amortized: run fn once (compile), then time `iters` dispatches."""
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:45s} {dt*1e3:9.2f} ms")
    return dt, out


def main():
    n = int(os.environ.get("N_RAYS", str(1920 * 1080)))
    tris = int(os.environ.get("PROBE_TRIS", "139000"))
    print(f"n_rays={n} tris={tris} device={jax.devices()[0]}")

    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=tris, material=1), (0.0, 0.0, -4.0)
    )
    scene = build_scene([dragon], materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    w, h = 1920, n // 1920
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, 1)
    orig = to_tile_order(orig, w, h, 1)[:n]
    dirn = to_tile_order(dirn, w, h, 1)[:n]

    key = jax.random.PRNGKey(0)

    # ---- primitives --------------------------------------------------------
    keys_i = jax.random.randint(key, (n,), 0, 1 << 18, jnp.int32)
    chans = jax.random.normal(key, (n, 14), jnp.float32)

    timeit(jax.jit(jnp.argsort), keys_i, label="argsort int32")
    perm = jnp.argsort(keys_i)
    timeit(jax.jit(lambda c, p: c[p]), chans, perm, label="apply perm (n,14) gather")
    timeit(
        jax.jit(lambda c, p: jnp.take(c, p, axis=0)), chans, perm,
        label="take axis0 (n,14)",
    )

    def multisort(k, c):
        ops = (k,) + tuple(c[:, i] for i in range(14))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return out[1]

    timeit(jax.jit(multisort), keys_i, chans, label="lax.sort 1key+14 operands")

    cs = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    timeit(cs, keys_i > 0, label="cumsum int32 (partition rank)")

    # ---- real bounce-1 rays ------------------------------------------------
    @jax.jit
    def bounce1(o, d, k):
        fo = wide_shade_first_hit(accel, o, d)
        hit = fo["id"] >= 0
        uni = ray_uniforms(k, jnp.arange(o.shape[0], dtype=jnp.int32), 1, 3)
        nd = _bounce_dir(d, fo["normal"], fo["scatter"], uni)
        t_safe = jnp.where(hit, fo["t"], 0.0)
        o2 = jnp.where(hit[:, None], o + t_safe[:, None] * d, 1.0e7)
        d2 = jnp.where(hit[:, None], nd, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, hit

    o2, d2, alive = jax.block_until_ready(bounce1(orig, dirn, key))
    live = float(jnp.mean(alive.astype(jnp.float32)))
    print(f"bounce-1 live fraction: {live:.3f}")

    def kernel_on(o, d, a):
        f = jax.jit(
            lambda o_, d_, a_: wide_shade_first_hit(accel, o_, d_, alive=a_)["t"]
        )
        return timeit(f, o, d, a, iters=4, label="")[0]

    af = alive.astype(jnp.float32)
    dt = kernel_on(o2, d2, af)
    print(f"kernel on bounce-1 rays unsorted: {n/dt/1e6:8.2f} M work-rays/s "
          f"({live*n/dt/1e6:.2f} M live/s)")

    # octant+cell sort
    v = scene.mesh.vertices
    lo_, hi_ = jnp.min(jnp.asarray(v), axis=0), jnp.max(jnp.asarray(v), axis=0)
    q = jnp.clip((o2 - lo_) / jnp.maximum(hi_ - lo_, 1e-6), 0.0, 1.0)
    cell = (q * 31.0).astype(jnp.int32)
    octant = ((d2[:, 0] > 0).astype(jnp.int32)
              + 2 * (d2[:, 1] > 0).astype(jnp.int32)
              + 4 * (d2[:, 2] > 0).astype(jnp.int32))
    k_ = (octant << 15) | (cell[:, 0] << 10) | (cell[:, 1] << 5) | cell[:, 2]
    k_ = jnp.where(alive, k_, jnp.int32(1) << 30)
    p = jnp.argsort(k_)
    o2s, d2s, afs = o2[p], d2[p], af[p]
    dt = kernel_on(o2s, d2s, afs)
    print(f"kernel on bounce-1 rays sorted:   {n/dt/1e6:8.2f} M work-rays/s "
          f"({live*n/dt/1e6:.2f} M live/s)")

    # octant-only sort
    k2 = jnp.where(alive, octant, 1 << 30)
    p2 = jnp.argsort(k2)
    dt = kernel_on(o2[p2], d2[p2], af[p2])
    print(f"kernel on bounce-1 rays octsort:  {n/dt/1e6:8.2f} M work-rays/s")

    # all dead (alive-skip ceiling)
    dt = kernel_on(o2, d2, jnp.zeros_like(af))
    print(f"kernel all-dead blocks:           {n/dt/1e6:8.2f} M work-rays/s")

    # coherent reference
    dt = kernel_on(orig, dirn, jnp.ones_like(af))
    print(f"kernel coherent primaries:        {n/dt/1e6:8.2f} M work-rays/s")


if __name__ == "__main__":
    main()
