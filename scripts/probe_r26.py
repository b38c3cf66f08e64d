"""Round-3 probe #26: can reordering fix REAL bounce-1 divergence?

Takes the true b1-entering state (probe_r25 chain) and times the
production kernel under reorderings, amortized:
  - film-tile order (production today)
  - octant grouped WITHIN neighborhoods of R rows (preserves origin
    locality, gives blocks direction-pure lanes) for R in {8, 32, 64}
  - global (morton cell, octant) per-ray sort
  - global (octant, morton) per-ray sort

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r26.py
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
K = 8


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

    @jax.jit
    def step(o, d, alive, b):
        out = wide_shade_first_hit(accel, o, d, alive=alive, multi_pop=4)
        t_m, n_m, sc_m = out["t"], out["normal"], out["scatter"]
        hit_m = out["id"] >= 0
        denom = d @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, -(o @ pn + poff) / denom,
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
    o_np, d_np, a_np = np.asarray(o1), np.asarray(d1), np.asarray(a1)
    n_live = int(a_np.sum())
    print(f"b1 entering: {n_live/1e3:.1f}k live of {N/1e6:.2f}M")

    octd = ((d_np[:, 0] > 0) * 4 + (d_np[:, 1] > 0) * 2
            + (d_np[:, 2] > 0)).astype(np.int64)
    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    q = np.clip((o_np - lo) / np.maximum(hi - lo, 1e-6), 0, 1)
    cellb = (q * 63).astype(np.int64)

    def spread3(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = ((spread3(cellb[:, 0]) << 2) | (spread3(cellb[:, 1]) << 1)
              | spread3(cellb[:, 2]))
    iota = np.arange(N, dtype=np.int64)
    dead_hi = np.where(a_np, 0, 1 << 40)

    def nb_octant(rows):
        nb = iota // (rows * 128)
        return np.argsort(dead_hi + (nb << 10) + (octd << 2)
                          + (iota & 3) * 0, kind="stable")

    orders = {
        "film-tile (production)": iota,
        "nb=8rows, octant      ": nb_octant(8),
        "nb=32rows, octant     ": nb_octant(32),
        "nb=64rows, octant     ": nb_octant(64),
        "global morton,oct     ": np.argsort(dead_hi + (morton << 3) + octd,
                                             kind="stable"),
        "global oct,morton     ": np.argsort(dead_hi + (octd << 21) + morton,
                                             kind="stable"),
    }

    for label, perm in orders.items():
        o_s = jnp.asarray(o_np[perm])
        d_s = jnp.asarray(d_np[perm])
        a_s = jnp.asarray(a_np[perm])

        def f(salt, o=o_s, d=d_s, a=a_s):
            def body(i, acc):
                oo = o + (salt + i.astype(jnp.float32)) * 1e-12
                return acc + wide_shade_first_hit(
                    accel, oo, d, alive=a, multi_pop=4)["t"][0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        fj = jax.jit(f)
        jax.block_until_ready(fj(jnp.float32(0.5)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fj(jnp.float32(1.0 + i)))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.025) / K
        print(f"{label}: {t*1e3:8.2f} ms/op  "
              f"{n_live/t/1e6:6.2f} M live rays/s", flush=True)


if __name__ == "__main__":
    main()
