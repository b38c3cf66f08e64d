"""Does FINE direction sorting make bounce rays traversal-coherent?

Octant-level sorting (3 dir bits) measured a mere 13% kernel win — an
octant is a 90-degree cone, still divergent at block granularity. This
probe sweeps key granularity: dir bits from 3 (octant) to 15, with and
without spatial-cell bits, on REAL bounce-1 rays of the dragon-tier frame,
plus the floor plane so the live fraction matches the bench (~45%).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dirsort.py
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
from atray_tpu.core.intersect import plane_hits
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import _bounce_dir, ray_uniforms, to_tile_order
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate


def timeit(fn, *a, iters=4):
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("N_RAYS", str(2 * 1920 * 1080)))
    tris = int(os.environ.get("PROBE_TRIS", "139000"))
    print(f"n_rays={n} tris={tris} device={jax.devices()[0]}")

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
    spp = max(1, n // (w * h))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, spp)
    orig = to_tile_order(orig, w, h, spp)[:n]
    dirn = to_tile_order(dirn, w, h, spp)[:n]
    key = jax.random.PRNGKey(0)

    # real bounce-1 rays INCLUDING the floor plane (matches the bench frame)
    @jax.jit
    def bounce1(o, d, k):
        fo = wide_shade_first_hit(accel, o, d)
        t = fo["t"]
        nrm = fo["normal"]
        sc = fo["scatter"]
        tp, pid = plane_hits(o, d, scene.planes.normals, scene.planes.offsets)
        closer = tp < t
        t = jnp.where(closer, tp, t)
        nrm = jnp.where(closer[:, None], scene.planes.normals[0][None], nrm)
        sc = jnp.where(closer, 0.0, sc)
        hit = (fo["id"] >= 0) | closer
        uni = ray_uniforms(k, jnp.arange(o.shape[0], dtype=jnp.int32), 1, 3)
        nd = _bounce_dir(d, nrm, sc, uni)
        t_safe = jnp.where(hit, t, 0.0)
        o2 = jnp.where(hit[:, None], o + t_safe[:, None] * d, 1.0e7)
        d2 = jnp.where(hit[:, None], nd, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, hit

    o2, d2, alive = jax.block_until_ready(bounce1(orig, dirn, key))
    live = float(jnp.mean(alive.astype(jnp.float32)))
    print(f"bounce-1 live fraction (with floor): {live:.3f}")
    af = alive.astype(jnp.float32)

    jk = jax.jit(
        lambda o_, d_, a_: wide_shade_first_hit(accel, o_, d_, alive=a_)["t"]
    )

    dt = timeit(jk, o2, d2, af)
    print(f"unsorted:                  {dt*1e3:8.1f} ms  "
          f"{n/dt/1e6:6.2f} Mwork/s  {live*n/dt/1e6:5.2f} Mlive/s")

    v = jnp.asarray(scene.mesh.vertices)
    lo_, hi_ = jnp.min(v, axis=0), jnp.max(v, axis=0)

    def dir_code(d, bits_per_axis):
        """Quantized direction: bits_per_axis per component of the
        normalized direction (equal-angle-ish grid on the cube)."""
        m = (1 << bits_per_axis) - 1
        q = jnp.clip((d * 0.5 + 0.5) * m, 0, m).astype(jnp.int32)
        return (q[:, 0] << (2 * bits_per_axis)) | (q[:, 1] << bits_per_axis) | q[:, 2]

    def cell_code(o, bits_per_axis):
        m = (1 << bits_per_axis) - 1
        q = jnp.clip((o - lo_) / jnp.maximum(hi_ - lo_, 1e-6), 0.0, 1.0)
        c = (q * m).astype(jnp.int32)
        return (c[:, 0] << (2 * bits_per_axis)) | (c[:, 1] << bits_per_axis) | c[:, 2]

    configs = [
        ("dir1 (octant)", 1, 0),
        ("dir2", 2, 0),
        ("dir3", 3, 0),
        ("dir4", 4, 0),
        ("dir5", 5, 0),
        ("dir3+cell3", 3, 3),
        ("dir4+cell2", 4, 2),
        ("cell3+dir3 (cell major)", -3, 3),
        ("cell5+dir2 (cell major)", -2, 5),
    ]
    for name, db, cb in configs:
        if db > 0:
            k_ = dir_code(d2, db)
            if cb:
                k_ = (k_ << (3 * cb)) | cell_code(o2, cb)
        else:
            db2 = -db
            k_ = (cell_code(o2, cb) << (3 * db2)) | dir_code(d2, db2)
        k_ = jnp.where(alive, k_, jnp.int32(1) << 30)
        p = jnp.argsort(k_)
        o2s, d2s, afs = o2[p], d2[p], af[p]
        dt = timeit(jk, o2s, d2s, afs)
        print(f"{name:26s} {dt*1e3:8.1f} ms  "
              f"{n/dt/1e6:6.2f} Mwork/s  {live*n/dt/1e6:5.2f} Mlive/s")


if __name__ == "__main__":
    main()
