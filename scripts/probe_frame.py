"""Frame-time breakdown: where do the bench's seconds actually go?

Times ONE spp-pass (default 8 spp at 1080p, the bench's dispatch unit) at
bounce_limit = 1..B on the bench scene (dragon + floor plane), so the delta
between successive limits is the marginal cost of that bounce (kernel +
glue). Also times the primary-only kernel call for reference.

Run: python -u scripts/probe_frame.py
Env: PF_SPP (8), PF_BOUNCES (5), PF_TRIS (139000), PF_CHUNK (default bench
     chunk), PF_SORT (0), PF_LEAF (16)
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ATRAY_JAX_CACHE", os.path.expanduser("~/.cache/jax_atray")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from atray_tpu.accel.shaded import build_shaded_accel
from atray_tpu.config import KDTreeConfig, RenderSettings
from atray_tpu.core.camera import look_at_camera
from atray_tpu.render.wavefront import render
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate


def timeit(fn, *a, iters=2):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    spp = int(os.environ.get("PF_SPP", "8"))
    bounces = int(os.environ.get("PF_BOUNCES", "5"))
    tris = int(os.environ.get("PF_TRIS", "139000"))
    sort = os.environ.get("PF_SORT", "0") == "1"
    leaf = int(os.environ.get("PF_LEAF", "16"))
    bins = int(os.environ.get("PF_BINS", "16"))
    w, h = 1920, 1080
    chunk = int(os.environ.get("PF_CHUNK", str(2 * w * h)))

    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=tris, material=1), (0.0, 0.0, -4.0)
    )
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    t0 = time.perf_counter()
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=leaf,
                                                   sah_bins=bins))
    jax.block_until_ready((accel.cboxes, accel.tris))
    print(f"accel: {accel.num_nodes} nodes, build {time.perf_counter()-t0:.2f}s",
          flush=True)
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    key = jax.random.PRNGKey(0)

    prev = 0.0
    for b in range(1, bounces + 1):
        settings = RenderSettings(
            resolution=(w, h), samples_per_pixel=spp, bounce_limit=b,
            ray_chunk=chunk, sort_bounces=sort,
        )
        jr = jax.jit(lambda k, s=settings: render(
            scene, cam, s, k, accel=accel, return_stats=True))
        t0 = time.perf_counter()
        film, stats = jr(key)
        jax.block_until_ready(film)
        tc = time.perf_counter() - t0
        dt = timeit(lambda k: jax.block_until_ready(jr(k)[0]), key)
        live = float(stats["rays_cast"])
        n_rays = w * h * spp
        print(
            f"bounce_limit={b}: pass {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} "
            f"ms marginal)  compile {tc:6.1f}s  live {live/1e6:7.1f}M "
            f"({live/n_rays:.2f}x)",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
