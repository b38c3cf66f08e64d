"""Round-2 probe #11: kernel shape sweep on the TRUE production bounce-1.

probe_r10 (B=2 trace): the scanned bounce kernel costs 587 ms — not the
88 ms of earlier probes, because production bounce-1 rays include FLOOR
respawns: ~60% live, film-coherent origins, fully divergent directions.
Sweep (n_inter, block_sub, multi_pop) on that state; also try a row sort
before it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r11.py
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
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


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
        t_m = out["t"]
        n_m = out["normal"]
        hit_m = out["id"] >= 0
        sc_m = out["scatter"]
        # plane hit (matches production _patch_spheres_planes)
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

    o1, d1, alive = b0_state()
    live = float(jnp.mean(alive))
    print(f"production-like b1 state: live={live:.3f}")
    af = alive.astype(jnp.float32)

    for ni, bs, mp in [
        (2, 8, 4), (2, 8, 1), (2, 4, 4), (4, 4, 4), (4, 8, 4),
        (8, 2, 4), (2, 2, 4), (4, 2, 4), (2, 16, 4),
    ]:
        f = jax.jit(
            lambda o_, d_, a_, ni=ni, bs=bs, mp=mp: wide_shade_first_hit(
                accel, o_, d_, alive=a_, n_inter=ni, block_sub=bs,
                multi_pop=mp,
            )["t"]
        )
        try:
            t, _ = bench(f, o1, d1, af)
            print(f"b1 ni={ni} S={bs:2d} K={mp}: {t*1e3:7.1f} ms"
                  f"  {N/t/1e6:5.1f} Mwork/s  {live*N/t/1e6:5.1f} Mlive/s")
        except Exception as e:
            print(f"b1 ni={ni} S={bs:2d} K={mp}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")

    # row sort before b1
    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)

    @jax.jit
    def row_sort(o, d, a):
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 15.0).astype(jnp.int32)
        octd = ((d[:, 0] > 0).astype(jnp.int32) * 4
                + (d[:, 1] > 0).astype(jnp.int32) * 2
                + (d[:, 2] > 0).astype(jnp.int32))
        k = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | octd
        k = jnp.where(a, k, jnp.int32(1) << 30)
        rows = N // 128
        rp = jnp.argsort(jnp.min(k.reshape(rows, 128), axis=1), stable=True)
        tk = lambda x: x.reshape((rows, 128) + x.shape[1:])[rp].reshape(x.shape)
        return tk(o), tk(d), tk(a)

    ts, (o1s, d1s, als) = bench(row_sort, o1, d1, alive)
    f = jax.jit(lambda o_, d_, a_: wide_shade_first_hit(
        accel, o_, d_, alive=a_, multi_pop=4)["t"])
    t, _ = bench(f, o1s, d1s, als.astype(jnp.float32))
    print(f"b1 row-sorted (ni=2 S=8 K=4): sort {ts*1e3:.1f} + walk "
          f"{t*1e3:7.1f} ms  {live*N/t/1e6:5.1f} Mlive/s")


if __name__ == "__main__":
    main()
