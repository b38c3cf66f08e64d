"""On-chip perf probes for the dragon-tier frame (not part of the bench).

Measures, with multi-second dispatches (>> the ~24 ms relay constant):
  1. fused-kernel throughput on coherent camera rays vs shuffled rays
  2. trace_radiance cost vs bounce_limit (the per-bounce ramp)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py
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
from atray_tpu.config import KDTreeConfig, RenderSettings
from atray_tpu.core.camera import camera_rays, look_at_camera
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import to_tile_order, trace_radiance
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate


def timed(fn, *a, reps=3):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    tris = int(os.environ.get("PROBE_TRIS", "139000"))
    n = int(os.environ.get("PROBE_RAYS", str(2 * 1920 * 1080)))
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
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    w, h = 1920, 1080
    spp = n // (w * h)
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, spp)
    orig = to_tile_order(orig, w, h, spp)
    dirn = to_tile_order(dirn, w, h, spp)
    print(f"{tris} tris, {n/1e6:.1f}M rays, nodes={accel.num_nodes}")

    jk = jax.jit(lambda o, d: wide_shade_first_hit(accel, o, d)["t"])

    t, _ = timed(jk, orig, dirn)
    print(f"kernel coherent (tile order):   {t:.3f}s  {n/t/1e6:6.1f} Mray/s")

    perm = np.random.default_rng(0).permutation(n)
    os_, ds_ = orig[perm], dirn[perm]
    t, _ = timed(jk, os_, ds_)
    print(f"kernel shuffled (same dirs):    {t:.3f}s  {n/t/1e6:6.1f} Mray/s")

    # fully incoherent: random origins in the scene bound, random dirs
    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32) + jnp.asarray(
        [[0.0, 0.0, -4.0]], jnp.float32
    )
    rd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    t, _ = timed(jk, ro, rd)
    print(f"kernel random o+d:              {t:.3f}s  {n/t/1e6:6.1f} Mray/s")

    # per-bounce ramp of the full trace
    for b in (1, 2, 3, 5):
        jt = jax.jit(
            lambda o, d, b=b: trace_radiance(
                scene, o, d, b, key=jax.random.PRNGKey(0), accel=accel
            )
        )
        t, _ = timed(jt, orig, dirn, reps=2)
        print(f"trace bounce_limit={b}:          {t:.3f}s  "
              f"(+{t:.3f})")


if __name__ == "__main__":
    main()
