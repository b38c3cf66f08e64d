"""Round-2 probe #9: bisect the ~250 ms/bounce non-kernel glue (probe_r8).

At 4.15M rays (2spp 1080p) the production render spends 340 ms on a
1-bounce frame whose kernel costs 87 ms. Time each pipeline piece as its
own jitted callable: ray-gen+tile order, per-bounce uniforms, the fused
kernel, the post-kernel shading arithmetic, film assembly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r9.py
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
    _bounce_dir, ray_uniforms, to_tile_order, from_tile_order,
)
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H, SPP = 1920, 1080, 2
N = W * H * SPP


def bench(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    print("device:", jax.devices()[0], " rays:", N)
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

    @jax.jit
    def gen(k):
        o, d = camera_rays(cam, W, H, SPP, key=k, anti_aliasing=False)
        return to_tile_order(o, W, H, SPP), to_tile_order(d, W, H, SPP)

    t, (o, d) = bench(gen, key)
    print(f"ray-gen + tile order: {t*1e3:7.1f} ms")

    ids = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def unis(k):
        return ray_uniforms(k, ids, 0)

    t, u = bench(unis, key)
    print(f"ray_uniforms (3ch):   {t*1e3:7.1f} ms")

    alive = jnp.ones((N,), jnp.float32)
    kfn = jax.jit(lambda o_, d_: wide_shade_first_hit(accel, o_, d_, alive=alive))
    t, out = bench(kfn, o, d)
    print(f"fused kernel:         {t*1e3:7.1f} ms")

    sky = jnp.asarray([0.35, 0.45, 0.65], jnp.float32)

    @jax.jit
    def shade(o_, d_, out_, u_):
        t_ = out_["t"]
        n = out_["normal"]
        hit = out_["id"] >= 0
        weight = jnp.ones((N, 3), jnp.float32)
        color = jnp.where(~hit[:, None], weight * sky, 0.0)
        cos_in = dot(-d_, n)
        backface = cos_in < 0.0
        n_o = jnp.where(backface[:, None], -n, n)
        atten = jnp.where(backface, 0.0, cos_in)
        color = color + jnp.where(hit[:, None], weight * out_["emission"], 0.0)
        t_safe = jnp.where(hit, t_, 0.0)
        hit_p = o_ + t_safe[:, None] * d_
        weight = jnp.where(
            hit[:, None], weight * out_["albedo"] * atten[:, None], weight
        )
        new_d = _bounce_dir(d_, n_o, out_["scatter"], u_)
        o2 = jnp.where(hit[:, None], hit_p, 1.0e7)
        d2 = jnp.where(hit[:, None], new_d, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, weight, color

    t, _ = bench(shade, o, d, out, u)
    print(f"shade arithmetic:     {t*1e3:7.1f} ms")

    color = jnp.abs(jax.random.normal(key, (N, 3), jnp.float32))

    @jax.jit
    def film(c):
        c = from_tile_order(c, W, H, SPP)
        return jnp.clip(c.reshape(SPP, H, W, 3).mean(0), 0.0, 1.0)

    t, _ = bench(film, color)
    print(f"film assembly:        {t*1e3:7.1f} ms")

    # everything fused in ONE jit (as production would fuse it)
    @jax.jit
    def whole(k):
        o_, d_ = gen(k)
        u_ = unis(k)
        out_ = wide_shade_first_hit(accel, o_, d_, alive=alive)
        o2, d2, w_, c_ = shade(o_, d_, out_, u_)
        return film(c_)

    t, _ = bench(whole, key)
    print(f"1-bounce fused total: {t*1e3:7.1f} ms (production render: 340)")


if __name__ == "__main__":
    main()
