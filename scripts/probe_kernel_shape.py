"""Sweep fused-kernel shape knobs on incoherent rays (the frame bottleneck).

Measures wide_shade_first_hit rate on shuffled bounce-like rays vs:
  - block_sub (rays per traversal half = block_sub*128)
  - leaf_size (triangles per BVH leaf)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_kernel_shape.py
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
from atray_tpu.render.wavefront import to_tile_order
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import make_materials
from atray_tpu.scene.transforms import translate


def timed(fn, *a, reps=2):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    tris = int(os.environ.get("PROBE_TRIS", "139000"))
    n = int(os.environ.get("PROBE_RAYS", str(1 * 1920 * 1080)))
    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=tris, material=1), (0.0, 0.0, -4.0)
    )
    scene = build_scene([dragon], materials=mats)
    w, h = 1920, 1080
    spp = max(1, n // (w * h))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, spp)
    orig = to_tile_order(orig, w, h, spp)
    dirn = to_tile_order(dirn, w, h, spp)
    perm = np.random.default_rng(0).permutation(orig.shape[0])
    os_, ds_ = orig[perm], dirn[perm]

    t_ref = None
    for leaf in (8, 16, 32):
        accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=leaf))
        for bs in (2, 4, 8, 16):
            jk = jax.jit(
                lambda o, d, a=accel, b=bs: wide_shade_first_hit(
                    a, o, d, block_sub=b
                )["t"]
            )
            try:
                tc, out = timed(jk, orig, dirn)
                ts, out_s = timed(jk, os_, ds_)
            except Exception as e:
                print(f"leaf={leaf:3d} bs={bs:3d}  FAILED {type(e).__name__}")
                continue
            if t_ref is None:
                t_ref = out
            ok = bool(jnp.all(jnp.isclose(out, t_ref, rtol=1e-5, atol=1e-5)))
            print(
                f"leaf={leaf:3d} bs={bs:3d}  nodes={accel.num_nodes:5d}  "
                f"coherent {n/tc/1e6:6.1f} M/s  shuffled {n/ts/1e6:6.2f} M/s"
                f"  {'OK' if ok else 'MISMATCH'}"
            )


if __name__ == "__main__":
    main()
