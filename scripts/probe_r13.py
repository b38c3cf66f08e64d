"""Round-3 probe #13: decompose the per-bounce XLA glue.

probe_frame shows a late bounce costs ~190 ms per 4.15M-ray chunk even
when <3% of rays are live and the (new) kernel skips every dead pair —
so the cost must be in the XLA program AROUND the kernel. This probe
times, at the single-chunk scale (2.07M rays), a scan of B iterations of:

  A. uniforms only            (ray_uniforms per bounce + trivial carry)
  B. glue only                (full bounce_step elementwise math, hit
                               data faked as constants — no kernel)
  C. kernel only              (fused call on an ALL-DEAD wavefront —
                               dead-pair skip engaged, no shading math)
  D. kernel+glue              (the real thing: trace_radiance marginal)

Marginal cost per added iteration tells us where the 190 ms lives.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r13.py
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
from atray_tpu.core.intersect import dot, normalize, reflect
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import (
    _bounce_dir,
    ray_uniforms,
    to_tile_order,
    trace_radiance,
)
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
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]]), offsets=jnp.asarray([-1.8]),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=W / H)
    key = jax.random.PRNGKey(0)
    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    ids = jnp.arange(N, dtype=jnp.int32)

    def scanned(body, b_iters, *xs):
        def f(carry, b):
            return body(carry, b), None
        carry, _ = jax.lax.scan(f, xs, jnp.arange(b_iters))
        return carry

    # ---------------- A: uniforms only ----------------
    def body_uni(carry, b):
        o, d = carry
        u = ray_uniforms(key, ids, b)
        return (o + u * 1e-9, d)

    for B in (1, 3):
        t = bench(jax.jit(lambda o, d, B=B: scanned(body_uni, B, o, d)),
                  orig, dirn)
        print(f"A uniforms-only   B={B}: {t*1e3:7.1f} ms")

    # ---------------- B: glue only (fake hit data) ----------------
    em = scene.materials.emission
    sky = em[0]

    def body_glue(carry, b):
        o, d, weight, color, alive = carry
        u = ray_uniforms(key, ids, b)
        # fake kernel outputs (constants broadcast — costs ~nothing)
        t_ = jnp.full((N,), 2.0)
        n_ = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (N, 3))
        hit = alive & (t_ < 3.0)
        em_ray = jnp.zeros((N, 3))
        al_ray = jnp.full((N, 3), 0.6)
        sc_ray = jnp.full((N,), 0.1)
        miss_now = alive & ~hit
        color = color + jnp.where(miss_now[:, None], weight * sky, 0.0)
        live_hit = alive & hit
        cos_in = dot(-d, n_)
        backface = cos_in < 0.0
        n_o = jnp.where(backface[:, None], -n_, n_)
        atten = jnp.where(backface, 0.0, cos_in)
        color = color + jnp.where(live_hit[:, None], weight * em_ray, 0.0)
        t_safe = jnp.where(hit, t_, 0.0)
        hit_p = o + t_safe[:, None] * d
        weight = jnp.where(live_hit[:, None],
                           weight * al_ray * atten[:, None], weight)
        new_d = _bounce_dir(d, n_o, sc_ray, u[:, 0:3])
        o = jnp.where(live_hit[:, None], hit_p, o)
        d = jnp.where(live_hit[:, None], new_d, d)
        alive = live_hit
        o = jnp.where(alive[:, None], o, 1.0e7)
        d = jnp.where(alive[:, None], d, jnp.asarray([0.0, 0.0, 1.0]))
        return (o, d, weight, color, alive)

    st0 = (orig, dirn, jnp.ones((N, 3)), jnp.zeros((N, 3)),
           jnp.ones((N,), bool))
    for B in (1, 3):
        t = bench(jax.jit(lambda s, B=B: scanned(
            lambda c, b: body_glue(c, b), B, *s)), st0)
        print(f"B glue-only       B={B}: {t*1e3:7.1f} ms")

    # ---------------- C: kernel only, all dead ----------------
    dead = jnp.zeros((N,), jnp.float32)

    def body_kernel(carry, b):
        o, d = carry
        out = wide_shade_first_hit(accel, o, d, alive=dead, multi_pop=4)
        return (o + out["t"][:, None] * 1e-9, d)

    for B in (1, 3):
        t = bench(jax.jit(lambda o, d, B=B: scanned(body_kernel, B, o, d)),
                  orig, dirn)
        print(f"C dead-kernel     B={B}: {t*1e3:7.1f} ms")

    # ---------------- D: the real thing ----------------
    for B in (3, 4, 5):
        f = jax.jit(lambda o, d, B=B: trace_radiance(
            scene, o, d, B, key=key, accel=accel, sort_rays=True,
            ray_ids=ids))
        t = bench(f, orig, dirn)
        print(f"D trace bl={B}:      {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
