"""Round-2 probe #6: does RE-sorting every bounce beat the one-shot sort?

probe_r5 measured the compaction apply at ~0.1 ms / 2M rays on v5e (argsort
+ gathers run at HBM speed — the old ~96 ms number was an artifact of
measuring through the relay dispatch). That reopens the schedule question:
after the one-shot sort at the first diffuse bounce, survivors' ORIGINS
drift apart every bounce (each ray moves to its new hit point), so block
unions re-widen. If the apply is free, re-grouping by current origin before
every bounce might pay.

Method: advance REAL bench-frame state (dragon proxy 139k + floor, 1920x1080)
bounce by bounce with the production kernel; at each bounce measure the
fused-kernel time (a) in the order inherited from the bounce-1 sort and
(b) freshly re-sorted by current origin cell. Report per-bounce times and
live fractions.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r6.py
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
from atray_tpu.render.wavefront import (
    BOUNCE_MULTI_POP, _bounce_dir, ray_uniforms, to_tile_order,
)
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080


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
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera(
        (0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9, aspect=W / H
    )
    key = jax.random.PRNGKey(0)
    N = W * H

    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)

    @jax.jit
    def sort_by_origin(o, d, alive):
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 15.0).astype(jnp.int32)
        octd = (
            (d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32)
        )
        k = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | octd
        k = jnp.where(alive, k, jnp.int32(1) << 30)
        perm = jnp.argsort(k, stable=True)
        return o[perm], d[perm], alive[perm]

    def kern(mp):
        return jax.jit(
            lambda o_, d_, al_: wide_shade_first_hit(
                accel, o_, d_, alive=al_, multi_pop=mp
            )
        )

    k_primary = kern(1)
    k_bounce = kern(BOUNCE_MULTI_POP)

    # primary bounce (tile order, as production)
    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    ids = jnp.arange(N, dtype=jnp.int32)
    alive = jnp.ones((N,), bool)

    @jax.jit
    def advance(o, d, al, out, b):
        hit = (out["id"] >= 0) & al
        n = out["normal"]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        u = ray_uniforms(key, ids, b)
        newd = _bounce_dir(d, n, out["scatter"], u)
        point = o + out["t"][:, None] * d
        o = jnp.where(hit[:, None], point + 1e-3 * n, o)
        d = jnp.where(hit[:, None], newd, d)
        o = jnp.where(hit[:, None], o, 1.0e7)
        d = jnp.where(hit[:, None], d, jnp.asarray([0.0, 0.0, 1.0]))
        return o, d, hit

    t, out = bench(k_primary, orig, dirn, alive.astype(jnp.float32))
    print(f"b0 primary: {t*1e3:7.1f} ms  ({N/t/1e6:.1f} Mwork/s)")
    o, d, alive = advance(orig, dirn, alive, out, 0)

    # bounce 1 unsorted (production: sort AFTER this one)
    t, out = bench(k_bounce, o, d, alive.astype(jnp.float32))
    live = float(jnp.sum(alive)) / N
    print(f"b1 inherited: {t*1e3:7.1f} ms  live={live:.3f}")
    o, d, alive = advance(o, d, alive, out, 1)

    # now the two schedules diverge; track both states
    o_once, d_once, al_once = sort_by_origin(o, d, alive)  # one-shot sort
    o_re, d_re, al_re = o_once, d_once, al_once

    for b in range(2, 6):
        live = float(jnp.sum(al_once)) / N
        t_once, out_once = bench(
            k_bounce, o_once, d_once, al_once.astype(jnp.float32))
        t_re, out_re = bench(k_bounce, o_re, d_re, al_re.astype(jnp.float32))
        t_sort, _ = bench(sort_by_origin, o_re, d_re, al_re)
        print(
            f"b{b} live={live:.4f}  once-sorted: {t_once*1e3:7.1f} ms"
            f"   re-sorted: {t_re*1e3:7.1f} ms (+sort {t_sort*1e3:.1f} ms)"
        )
        o_once, d_once, al_once = advance(o_once, d_once, al_once, out_once, b)
        o_re, d_re, al_re = advance(o_re, d_re, al_re, out_re, b)
        o_re, d_re, al_re = sort_by_origin(o_re, d_re, al_re)


if __name__ == "__main__":
    main()
