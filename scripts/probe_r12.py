"""Round-3 probe #12: flags-kernel validation sweeps.

Measures, on the real chip, the two states the round-3 kernel changes
target:
  1. the production bounce-1 wavefront (divergent directions, ~60% live)
     across multi_pop K in {1, 4, 8, 12} — K > 4 newly packs masks into
     ceil(K/4) i32 planes, one pipeline stall per iteration;
  2. a SPARSE SORTED wavefront (~8% live rows, the bounce-3+ shape) where
     the dead-pair skip should make cost scale with live pairs, not total
     pairs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r12.py
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

from atray_tpu.accel.shaded import build_shaded_accel
from atray_tpu.config import KDTreeConfig
from atray_tpu.core.camera import camera_rays, look_at_camera
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import _bounce_dir, ray_uniforms, to_tile_order
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080
N = W * H


def bench(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=139000, material=1),
        (0.0, 0.0, -4.0),
    )
    pn = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    poff = jnp.float32(-1.8)
    planes = Planes(
        normals=pn[None], offsets=poff[None],
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera(
        (0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9, aspect=W / H
    )
    key = jax.random.PRNGKey(0)

    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    ids = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def b0_state():
        out = wide_shade_first_hit(accel, orig, dirn)
        t_m, n_m = out["t"], out["normal"]
        hit_m = out["id"] >= 0
        sc_m = out["scatter"]
        denom = dirn @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, -(orig @ pn + poff) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t_m
        t = jnp.where(closer, t_p, t_m)
        n = jnp.where(closer[:, None], pn, n_m)
        sc = jnp.where(closer, 0.0, sc_m)
        hit = hit_m | (t_p < 1e29)
        u = ray_uniforms(key, ids, 0)
        newd = _bounce_dir(dirn, n, sc, u)
        t_safe = jnp.where(hit, t, 0.0)
        point = orig + t_safe[:, None] * dirn
        o2 = jnp.where(hit[:, None], point + 1e-3 * n, 1.0e7)
        d2 = jnp.where(hit[:, None], newd, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, hit

    # coherent primaries baseline
    for mp in (1, 4):
        f = jax.jit(lambda o_, d_, mp=mp: wide_shade_first_hit(
            accel, o_, d_, multi_pop=mp)["t"])
        t = bench(f, orig, dirn)
        print(f"primary K={mp}: {t*1e3:7.1f} ms  {N/t/1e6:5.1f} M/s")

    o1, d1, alive = b0_state()
    live = float(jnp.mean(alive))
    af = alive.astype(jnp.float32)
    print(f"b1 state: live={live:.3f}")
    for mp in (1, 4, 8, 12):
        f = jax.jit(lambda o_, d_, a_, mp=mp: wide_shade_first_hit(
            accel, o_, d_, alive=a_, multi_pop=mp)["t"])
        try:
            t = bench(f, o1, d1, af)
            print(f"b1 K={mp:2d}: {t*1e3:7.1f} ms  {live*N/t/1e6:5.2f} Mlive/s")
        except Exception as e:
            print(f"b1 K={mp:2d}: FAILED {type(e).__name__}: {str(e)[:100]}")

    # sparse sorted state: keep ~8% of live rays (every 12th live row
    # pattern is realistic post-sort: a dense live prefix)
    rows = N // 128
    row_alive = np.zeros((rows, 128), np.float32)
    n_live_rows = rows // 12
    row_alive[:n_live_rows] = 1.0
    sparse_af = jnp.asarray(row_alive.reshape(-1))
    # give the live prefix real bounce rays (sorted by origin cell)
    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)

    @jax.jit
    def sort_rows(o, d, a):
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 15.0).astype(jnp.int32)
        octd = ((d[:, 0] > 0).astype(jnp.int32) * 4
                + (d[:, 1] > 0).astype(jnp.int32) * 2
                + (d[:, 2] > 0).astype(jnp.int32))
        k = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | octd
        k = jnp.where(a > 0, k, jnp.int32(1) << 30)
        rp = jnp.argsort(jnp.min(k.reshape(rows, 128), axis=1), stable=True)
        tk = lambda x: x.reshape((rows, 128) + x.shape[1:])[rp].reshape(x.shape)
        return tk(o), tk(d)

    os_, ds_ = sort_rows(o1, d1, af)
    for mp in (4, 8):
        f = jax.jit(lambda o_, d_, a_, mp=mp: wide_shade_first_hit(
            accel, o_, d_, alive=a_, multi_pop=mp)["t"])
        t = bench(f, os_, ds_, sparse_af)
        nl = float(jnp.sum(sparse_af))
        print(f"sparse-sorted (8% rows live) K={mp}: {t*1e3:7.1f} ms  "
              f"{nl/t/1e6:5.2f} Mlive/s")


if __name__ == "__main__":
    main()
