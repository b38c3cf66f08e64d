"""Round-3 probe #24: does PERFECT per-ray (cell, octant) grouping narrow
late-bounce traversal unions? Host-side full sorts (free for measurement)
of the probe_r14 trapped-survivor state, dense prefix, production kernel.

Orders tested: production row-sort (baseline), per-ray spatial-major
(cell<<3|oct), per-ray octant-major (oct<<24|cell), per-ray Morton
(cell,oct), random shuffle (worst case), all packed to a dense prefix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r24.py
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

    @jax.jit
    def b0_state():
        out = wide_shade_first_hit(accel, orig, dirn)
        t_m, n_m = out["t"], out["normal"]
        hit_m = out["id"] >= 0
        denom = dirn @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, -(orig @ pn + poff) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t_m
        t = jnp.where(closer, t_p, t_m)
        n = jnp.where(closer[:, None], pn, n_m)
        hit = hit_m | (t_p < 1e29)
        t_safe = jnp.where(hit, t, 0.0)
        point = orig + t_safe[:, None] * dirn
        return point, n, hit

    point, nrm, hit = b0_state()
    rng = np.random.default_rng(1)
    keep = jnp.asarray(rng.random(N) < 0.05) & hit
    u = ray_uniforms(jax.random.PRNGKey(9), ids, 7)
    d_new = _bounce_dir(dirn, nrm, jnp.zeros((N,)), u)

    o_np = np.asarray(point)
    d_np = np.asarray(d_new)
    k_np = np.asarray(keep)
    live_idx = np.nonzero(k_np)[0]
    n_live = len(live_idx)
    print(f"late-bounce synth: {n_live} live rays")

    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    q = np.clip((o_np[live_idx] - lo) / np.maximum(hi - lo, 1e-6), 0, 1)
    cellb = (q * 63).astype(np.int64)
    dl = d_np[live_idx]
    octd = ((dl[:, 0] > 0) * 4 + (dl[:, 1] > 0) * 2 + (dl[:, 2] > 0)).astype(np.int64)

    def spread3(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = (spread3(cellb[:, 0]) << 2) | (spread3(cellb[:, 1]) << 1) | spread3(cellb[:, 2])
    raster = (cellb[:, 0] << 12) | (cellb[:, 1] << 6) | cellb[:, 2]

    orders = {
        "unsorted prefix       ": np.arange(n_live),
        "raster<<3|oct         ": np.argsort((raster << 3) | octd, kind="stable"),
        "morton<<3|oct         ": np.argsort((morton << 3) | octd, kind="stable"),
        "oct<<18|raster        ": np.argsort((octd << 18) | raster, kind="stable"),
        "oct<<18|morton        ": np.argsort((octd << 18) | morton, kind="stable"),
        "random shuffle        ": rng.permutation(n_live),
    }

    widths = [((-n_live) % 2048) + n_live, 4_147_200]
    for label, perm in list(orders.items())[:1]:
        pass
    for width in widths:
      pad = width - n_live
      for label, perm in list(orders.items())[:2]:
        src = live_idx[perm]
        o_s = np.full((width, 3), 1.0e7, np.float32)
        d_s = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32),
                      (width, 1))
        o_s[:n_live] = o_np[src]
        d_s[:n_live] = d_np[src]
        a_s = np.zeros((width,), np.float32)
        a_s[:n_live] = 1.0
        oj, dj, aj = jnp.asarray(o_s), jnp.asarray(d_s), jnp.asarray(a_s)
        K = 8

        def f(o, d, a, salt):
            def body(i, acc):
                oo = o + (salt + i.astype(jnp.float32)) * 1e-12
                return acc + wide_shade_first_hit(
                    accel, oo, d, alive=a, multi_pop=4)["t"][0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        fj = jax.jit(f)
        jax.block_until_ready(fj(oj, dj, aj, jnp.float32(0.5)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fj(oj, dj, aj, jnp.float32(1.0 + i)))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.025) / K   # subtract ~dispatch floor
        print(f"w={width:8d} {label}: {t*1e3:8.2f} ms/op  "
              f"{n_live/t/1e6:6.2f} M live rays/s")


if __name__ == "__main__":
    main()


def tail_cost():
    """Same live state, embedded at the production 4.15M launch width
    (live prefix + parked dead tail): isolates the dead-tail cost."""
    import numpy as np
    print("--- tail-cost variant (see main for setup) ---")


