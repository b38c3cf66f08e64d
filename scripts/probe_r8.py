"""Round-2 probe #8: where does the PRODUCTION frame lose 3.6x vs kernels?

BENCH_r02 first cut: frame 64 s = 10.4 Mwork/s, but the kernel-level sum
(probe_r6/r7) predicts ~18 s. This probe times the real ``render()`` at
the bench scene/settings, sweeping bounce_limit (the per-bounce marginal
cost INCLUDING all glue: respawn, uniforms, film, compaction) and
comparing chunked vs whole dispatch, sort on/off.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r8.py
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
from atray_tpu.config import KDTreeConfig, RenderSettings
from atray_tpu.core.camera import look_at_camera
from atray_tpu.render.wavefront import render
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080


def bench(fn, *args, reps=2):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s, out


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

    def run(spp, bounces, chunk, sort):
        s = RenderSettings(
            resolution=(W, H), samples_per_pixel=spp, bounce_limit=bounces,
            ray_chunk=chunk, sort_bounces=sort,
        )
        f = jax.jit(lambda k: render(scene, cam, s, k, accel=accel))
        t, c, _ = bench(f, key)
        n = W * H * spp
        print(
            f"spp={spp} B={bounces} chunk={chunk or 'whole':>8} sort={int(sort)}:"
            f" {t*1e3:8.1f} ms  (compile {c:5.1f}s)"
            f"  {n*bounces/t/1e6:6.1f} Mwork/s"
        )
        return t

    # marginal cost per bounce, 2spp (4.15M rays), single dispatch
    prev = 0.0
    for b in range(1, 6):
        t = run(2, b, 0, True)
        print(f"    marginal bounce {b-1}: {(t-prev)*1e3:8.1f} ms")
        prev = t

    # sort off at full depth for comparison
    run(2, 5, 0, False)

    # the bench pass shape: 8spp, chunked at 2 frames
    t8 = run(8, 5, 2 * W * H, True)
    t2 = run(2, 5, 0, True)
    print(f"lax.map overhead: 8spp-chunked {t8*1e3:.0f} ms vs 4x 2spp "
          f"{4*t2*1e3:.0f} ms -> {t8/(4*t2):.2f}x")


if __name__ == "__main__":
    main()
