"""Round-4 probe #28: octant-regroup NET value on the real bounce-1 state.

probe_r26 timed the WALK under reorderings; the regroup ROUTING itself
measures 186 ms/call at nb=64 (probe_r27: cost ~ output-rows x window-span
steps, ~84 ns/step), which may eat the walk saving. This probe times the
END-TO-END chunk cost: dst build + lane_scatter(14 planes) + walk, for
nb in {8, 16, 32, 64}, vs the plain film-tile walk, all amortized inside
one jitted dispatch. Also reports the C-scaling of the router (7 vs 14
planes) to price a leaner regroup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r28.py
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
from atray_tpu.kernels.lane_pack import lane_scatter
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import (
    _bounce_dir,
    _class_rank_dst,
    ray_uniforms,
    to_tile_order,
)
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080
N = W * H
K = 6


def timeit(fn, *a, iters=3):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
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
    planes = Planes(normals=pn[None], offsets=poff[None],
                    material_id=jnp.asarray([2], jnp.int32))
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=W / H)
    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    ids = jnp.arange(N, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    sc_tab = jnp.asarray([0.0, 0.15, 0.0], jnp.float32)

    @jax.jit
    def step(o, d, alive, b):
        out = wide_shade_first_hit(accel, o, d, alive=alive, multi_pop=4)
        t_m, n_m = out["t"], out["normal"]
        sc_m = sc_tab[out["mat"]]
        hit_m = out["id"] >= 0
        denom = d @ pn
        # production plane equation: dot(n, x) = offset (intersect.py:175)
        # — probe_r26's replica had the sign flipped, which drops the
        # floor respawns and halves the live count (docs/KERNELS.md r3)
        t_p = jnp.where(jnp.abs(denom) > 1e-8, (poff - o @ pn) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t_m
        t = jnp.where(closer, t_p, t_m)
        nrm = jnp.where(closer[:, None], pn, n_m)
        sc = jnp.where(closer, 0.0, sc_m)
        hit = (hit_m | (t_p < 1e29)) & alive
        cos_in = jnp.sum(-d * nrm, axis=1)
        nrm = jnp.where(cos_in[:, None] < 0, -nrm, nrm)
        t_safe = jnp.where(hit, t, 0.0)
        point = o + t_safe[:, None] * d
        u = ray_uniforms(key, ids, b, 3)
        d2 = _bounce_dir(d, nrm, sc, u)
        o2 = jnp.where(hit[:, None], point, 1.0e7)
        d2 = jnp.where(hit[:, None], d2, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, hit

    o1, d1, a1 = step(orig, dirn, jnp.ones((N,), bool), 0)
    jax.block_until_ready(o1)
    n_live = int(np.asarray(a1).sum())
    print(f"b1 entering: {n_live/1e3:.1f}k live of {N/1e6:.2f}M", flush=True)
    rows = N // 128

    def walk_only(o, d, a):
        out = wide_shade_first_hit(accel, o, d, alive=a, multi_pop=4)
        return out["t"]

    @jax.jit
    def walk_k(o, d, a):
        acc = jnp.float32(0.0)
        for i in range(K):
            acc = acc + walk_only(o + acc * 0.0, d, a)[0]
        return acc

    dt, _ = timeit(walk_k, o1, d1, a1)
    base = dt / K
    print(f"film-tile walk: {base*1e3:8.1f} ms "
          f"({n_live/base/1e6:.2f} M live/s)", flush=True)

    for nb_rows in (8, 16, 32, 64):
        nb = nb_rows * 128
        wcap = min(nb_rows + 4, (rows // 4) * 4)

        def regroup(o, d, a, nb=nb, wcap=wcap, nb_rows=nb_rows):
            octd = ((d[:, 0] > 0).astype(jnp.int32) * 4
                    + (d[:, 1] > 0).astype(jnp.int32) * 2
                    + (d[:, 2] > 0).astype(jnp.int32))
            cls = jnp.where(a, octd, jnp.int32(8))
            dst = _class_rank_dst(cls, 9, nb)
            cols = jnp.stack(
                [o[:, i].reshape(rows, 128) for i in range(3)]
                + [d[:, i].reshape(rows, 128) for i in range(3)]
                + [a.astype(jnp.float32).reshape(rows, 128)] * 8
            )   # 14 planes (production regroups the full state width)
            pk = lane_scatter(cols, dst, wcap, anchor_align=nb_rows)
            o2 = jnp.stack([pk[i].reshape(-1) for i in range(3)], axis=1)
            d2 = jnp.stack([pk[3 + i].reshape(-1) for i in range(3)], axis=1)
            a2 = pk[6].reshape(-1) > 0.5
            o2 = jnp.where(a2[:, None], o2, 1.0e7)
            d2 = jnp.where(a2[:, None], d2, jnp.asarray([0.0, 0.0, 1.0]))
            return o2, d2, a2

        @jax.jit
        def reg_k(o, d, a, regroup=regroup):
            acc = jnp.float32(0.0)
            for i in range(K):
                o2, d2, a2 = regroup(o + acc * 0.0, d, a)
                acc = acc + o2[0, 0]
            return acc

        @jax.jit
        def e2e_k(o, d, a, regroup=regroup):
            acc = jnp.float32(0.0)
            for i in range(K):
                o2, d2, a2 = regroup(o + acc * 0.0, d, a)
                acc = acc + walk_only(o2, d2, a2)[0]
            return acc

        dt_r, _ = timeit(reg_k, o1, d1, a1)
        dt_e, _ = timeit(e2e_k, o1, d1, a1)
        w = (dt_e - dt_r) / K
        print(f"nb={nb_rows:3d}: regroup {dt_r/K*1e3:7.1f} ms  "
              f"walk {w*1e3:7.1f} ms ({n_live/w/1e6:.2f} M live/s)  "
              f"e2e {dt_e/K*1e3:7.1f} ms  vs base {base*1e3:7.1f} "
              f"-> net {(base-dt_e/K)*1e3:+7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
