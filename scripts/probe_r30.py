"""Round-4 probe #30: bounce-1 walk speed under TRUE per-ray orderings,
with valid methodology (large-output dispatches, salted arguments — see
docs/KERNELS.md round-4 measurement traps).

Round 2/3 never measured this cleanly: the dir-major key was tested at
row granularity, probe_r26's per-ray numbers used a plane-sign-bugged
replica AND relay-cached scalar timing. If a global (morton, octant) or
(octant, morton) per-ray sort speeds the walk >= 1.5x, wiring it costs
~130 ms/chunk (XLA argsort + 7-plane apply + 6-plane inverse).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r30.py
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
        denom = dy
        t_p = jnp.where(jnp.abs(denom) > 1e-8, (poff - oy) / denom,
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
        nx = jnp.where(bf, -nx, nx)
        ny = jnp.where(bf, -ny, ny)
        nz = jnp.where(bf, -nz, nz)
        ts = jnp.where(hit, t, 0.0)
        hx, hy, hz = ox + ts * dx, oy + ts * dy, oz + ts * dz
        u0, u1, u2 = wf._ray_uniform_cols(key, ids, b, 3)
        d2 = wf._bounce_dir_soa(dx, dy, dz, nx, ny, nz, sc, u0, u1, u2)
        ox2 = jnp.where(hit, hx, 1.0e7)
        oy2 = jnp.where(hit, hy, 1.0e7)
        oz2 = jnp.where(hit, hz, 1.0e7)
        dx2 = jnp.where(hit, d2[0], 0.0)
        dy2 = jnp.where(hit, d2[1], 0.0)
        dz2 = jnp.where(hit, d2[2], 1.0)
        return ox2, oy2, oz2, dx2, dy2, dz2, hit

    st = step(orig, dirn, jnp.ones((N,), bool), 0)
    ox, oy, oz, dx, dy, dz, a1 = jax.block_until_ready(st)
    n_live = int(np.asarray(a1).sum())
    print(f"b1 entering: {n_live/1e6:.3f}M live of {N/1e6:.2f}M", flush=True)

    # ---- orderings (host-side, numpy) ----------------------------------
    o_np = np.stack([np.asarray(ox), np.asarray(oy), np.asarray(oz)], 1)
    d_np = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], 1)
    a_np = np.asarray(a1)
    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    q = np.clip((o_np - lo) / np.maximum(hi - lo, 1e-6), 0, 1)
    cell = (q * 63).astype(np.int64)

    def spread3(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = ((spread3(cell[:, 0]) << 2) | (spread3(cell[:, 1]) << 1)
              | spread3(cell[:, 2]))
    octd = ((d_np[:, 0] > 0) * 4 + (d_np[:, 1] > 0) * 2
            + (d_np[:, 2] > 0)).astype(np.int64)
    # fine direction bins: 6 bits (octant + 2x 1 more bit? use theta/phi)
    dq = np.clip(((d_np + 1) * 0.5 * 7.999).astype(np.int64), 0, 7)
    finedir = (dq[:, 0] << 6) | (dq[:, 1] << 3) | dq[:, 2]
    dead = np.where(a_np, 0, 1 << 60)
    iota = np.arange(N, dtype=np.int64)

    orders = {
        "film-tile (production)": iota,
        "(morton, octant) pack": np.argsort(dead + (morton << 3) + octd,
                                            kind="stable"),
        "(octant, morton) pack": np.argsort(dead + (octd << 21) + morton,
                                            kind="stable"),
        "(finedir, morton) pack": np.argsort(dead + (finedir << 21) + morton,
                                             kind="stable"),
        "(morton<<9 | finedir)": np.argsort(dead + (morton << 9) + finedir,
                                            kind="stable"),
    }

    for name, perm in orders.items():
        po = jnp.asarray(o_np[perm])
        pd = jnp.asarray(d_np[perm])
        pa = jnp.asarray(a_np[perm])

        @jax.jit
        def walk(o, d, a, salt):
            # salt varies per call (relay cache); large output (returns
            # the full t plane reshaped 2D, ~16 MB after stack of 6)
            fo = wide_shade_planes(
                accel, o[:, 0] + salt, o[:, 1], o[:, 2],
                d[:, 0], d[:, 1], d[:, 2], a.astype(jnp.float32),
                multi_pop=4,
            )
            return jnp.stack([fo["t"], fo["nx"], fo["ny"], fo["nz"]])

        jax.block_until_ready(walk(po, pd, pa, jnp.float32(0.0)))
        ts = []
        for i in range(3):
            s = jnp.float32(i * 1e-7)   # harmless sub-epsilon shift
            t0 = time.perf_counter()
            jax.block_until_ready(walk(po, pd, pa, s))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{name:26s}: {dt*1e3:7.1f} ms "
              f"({n_live/dt/1e6:6.2f} M live/s)", flush=True)


if __name__ == "__main__":
    main()
