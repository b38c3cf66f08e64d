"""Consolidated round-2 on-chip probe: one process, all open questions.

Measures (dragon 139k tris, v5e, 2.07M rays):
  1. coherent primaries: K=1 vs multi_pop=4
  2. real bounce-1 rays (dragon-only scene, ~9% live): K=1 vs K=4
  3. bounce-1 sorted by the production sort_key (dir-bin major): K=1 vs K=4
     (tests whether ordered traversal + direction binning compound)
  4. fully shuffled worst case: K=1 vs K=4

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r2.py
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
from atray_tpu.render.wavefront import _bounce_dir, ray_uniforms, to_tile_order
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import make_materials
from atray_tpu.scene.transforms import translate


def timeit(fn, *a, iters=3):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(os.environ.get("N_RAYS", str(1920 * 1080)))
    tris = int(os.environ.get("PROBE_TRIS", "139000"))
    print(f"n_rays={n} tris={tris} device={jax.devices()[0]}", flush=True)

    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=tris, material=1), (0.0, 0.0, -4.0)
    )
    scene = build_scene([dragon], materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    print(f"accel built: {accel.num_nodes} nodes", flush=True)
    w, h = 1920, 1080
    spp = max(1, n // (w * h))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, spp)
    orig = to_tile_order(orig, w, h, spp)[:n]
    dirn = to_tile_order(dirn, w, h, spp)[:n]
    key = jax.random.PRNGKey(0)

    kernels = {
        k: jax.jit(
            lambda o_, d_, a_, k=k: wide_shade_first_hit(
                accel, o_, d_, alive=a_, multi_pop=k
            )["t"]
        )
        for k in (1, 4)
    }

    ones = jnp.ones((n,), jnp.float32)

    def row(label, o_, d_, a_):
        outs = {}
        for k, jk in kernels.items():
            dt = timeit(jk, o_, d_, a_)
            outs[k] = dt
            print(f"{label:28s} K={k}: {dt*1e3:7.1f} ms "
                  f"{n/dt/1e6:6.2f} Mwork/s", flush=True)
        if outs[1] > 0:
            print(f"{'':28s} K4/K1 speedup: {outs[1]/outs[4]:.2f}x",
                  flush=True)
        return outs

    # 1. coherent
    row("coherent primaries", orig, dirn, ones)

    # parity spot-check on chip (K=4 vs K=1, coherent)
    t1 = jax.device_get(kernels[1](orig, dirn, ones))
    t4 = jax.device_get(kernels[4](orig, dirn, ones))
    ok = np.array_equal(t1, t4)
    print(f"on-chip K4==K1 parity: {ok}", flush=True)
    if not ok:
        bad = np.flatnonzero(t1 != t4)
        print(f"  MISMATCH at {bad.size} lanes, first {bad[:5]}", flush=True)

    # 2. real bounce-1 rays
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
    af = alive.astype(jnp.float32)
    live = float(af.mean())
    print(f"bounce-1 live fraction: {live:.3f}", flush=True)
    row("bounce-1 unsorted", o2, d2, af)

    # 3. bounce-1 sorted by the production key (dir-bin major)
    dq = jnp.clip((d2 * 0.5 + 0.5) * 7.0, 0.0, 7.0).astype(jnp.int32)
    dbin = (dq[:, 0] << 6) | (dq[:, 1] << 3) | dq[:, 2]
    v = jnp.asarray(scene.mesh.vertices)
    lo_, hi_ = jnp.min(v, axis=0), jnp.max(v, axis=0)
    q = jnp.clip((o2 - lo_) / jnp.maximum(hi_ - lo_, 1e-6), 0.0, 1.0)
    cell = (q * 3.0).astype(jnp.int32)
    k_ = (dbin << 6) | (cell[:, 0] << 4) | (cell[:, 1] << 2) | cell[:, 2]
    k_ = jnp.where(alive, k_, jnp.int32(1) << 30)
    p = jnp.argsort(k_)
    o2s, d2s, afs = jax.block_until_ready((o2[p], d2[p], af[p]))
    row("bounce-1 dir-bin sorted", o2s, d2s, afs)

    # 4. shuffled worst case
    perm = np.random.default_rng(0).permutation(n)
    row("shuffled primaries", orig[perm], dirn[perm], ones)


if __name__ == "__main__":
    main()
