"""Round-4 probe #31: kernel-shape sweep on the TRUE b1 state with VALID
methodology (large outputs, salted args — docs/KERNELS.md round-4 traps).

Every earlier sweep (probe_r11's n_inter/block_sub/multi_pop table) used
scalar-output amortized chains that the relay served from cache, plus a
plane-sign-bugged state. Re-derive the optimum: the shipped config is
(n_inter=2, S=8, K=4).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r31.py
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
from atray_tpu.kernels.wide_shade import wide_shade_planes
from atray_tpu.render import wavefront as wf
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H, SPP = 1920, 1080, 2
N = W * H * SPP


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
    orig, dirn = camera_rays(cam, W, H, SPP)
    orig = wf.to_tile_order(orig, W, H, SPP)
    dirn = wf.to_tile_order(dirn, W, H, SPP)
    ids = jnp.arange(N, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    sc_tab = jnp.asarray([0.0, 0.15, 0.0], jnp.float32)

    @jax.jit
    def step(o, d, alive, b):
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        fo = wide_shade_planes(accel, ox, oy, oz, dx, dy, dz,
                               alive.astype(jnp.float32), multi_pop=4)
        t_m = fo["t"]
        nx, ny, nz = fo["nx"], fo["ny"], fo["nz"]
        sc_m = sc_tab[fo["mat"]]
        hit_m = fo["id"] >= 0
        t_p = jnp.where(jnp.abs(dy) > 1e-8, (poff - oy) / dy,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = (t_p < t_m) & (t_p < 1e29)
        t = jnp.where(closer, t_p, t_m)
        nx = jnp.where(closer, 0.0, nx)
        ny = jnp.where(closer, 1.0, ny)
        nz = jnp.where(closer, 0.0, nz)
        sc = jnp.where(closer, 0.0, sc_m)
        hit = (hit_m | closer) & alive
        cos_in = -(dx * nx + dy * ny + dz * nz)
        bf = cos_in < 0
        nx, ny, nz = (jnp.where(bf, -v, v) for v in (nx, ny, nz))
        ts = jnp.where(hit, t, 0.0)
        u0, u1, u2 = wf._ray_uniform_cols(key, ids, b, 3)
        d2 = wf._bounce_dir_soa(dx, dy, dz, nx, ny, nz, sc, u0, u1, u2)
        return (jnp.where(hit, ox + ts * dx, 1.0e7),
                jnp.where(hit, oy + ts * dy, 1.0e7),
                jnp.where(hit, oz + ts * dz, 1.0e7),
                jnp.where(hit, d2[0], 0.0),
                jnp.where(hit, d2[1], 0.0),
                jnp.where(hit, d2[2], 1.0),
                hit)

    ox, oy, oz, dx, dy, dz, a1 = jax.block_until_ready(
        step(orig, dirn, jnp.ones((N,), bool), 0)
    )
    n_live = int(np.asarray(a1).sum())
    print(f"b1 entering: {n_live/1e6:.3f}M live", flush=True)

    shapes = [
        (2, 8, 4),    # shipped
        (2, 8, 1),
        (2, 4, 4),
        (2, 16, 4),
        (1, 8, 4),
        (3, 8, 4),
        (4, 8, 4),
        (2, 8, 4, False),   # ordered=False
    ]
    for cfg in shapes:
        ni, S, K = cfg[:3]
        ordered = cfg[3] if len(cfg) > 3 else True

        @jax.jit
        def walk(ox, oy, oz, dx, dy, dz, a, salt, ni=ni, S=S, K=K,
                 ordered=ordered):
            fo = wide_shade_planes(
                accel, ox + salt, oy, oz, dx, dy, dz,
                a.astype(jnp.float32),
                block_sub=S, multi_pop=K, n_inter=ni, ordered=ordered,
            )
            return jnp.stack([fo["t"], fo["nx"], fo["ny"], fo["nz"]])

        try:
            jax.block_until_ready(
                walk(ox, oy, oz, dx, dy, dz, a1, jnp.float32(0.0))
            )
        except Exception as e:
            print(f"ni={ni} S={S:2d} K={K} ord={int(ordered)}: "
                  f"FAILED {str(e)[:80]}", flush=True)
            continue
        ts = []
        for i in range(3):
            s = jnp.float32(i * 1e-7)
            t0 = time.perf_counter()
            jax.block_until_ready(walk(ox, oy, oz, dx, dy, dz, a1, s))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"ni={ni} S={S:2d} K={K} ord={int(ordered)}: {dt*1e3:7.1f} ms"
              f" ({n_live/dt/1e6:6.2f} M live/s)", flush=True)


if __name__ == "__main__":
    main()
