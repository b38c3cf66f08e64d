"""Round-4 probe #32: the union tax, measured exactly.

Uses the kernel's stats mode (per-pair node/leaf visit counters) on the
real primary / bounce-1 / post-compact bounce-2 states, and compares
against PER-RAY needs (numpy DFS on the same wide tree over a ray
sample) to compute the union inflation factor — the round-5 planning
number: how much work a block-synchronous walk does relative to an
ideal per-ray machine.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r32.py
"""

import os

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
PAIR = 3 * 8 * 128          # n_inter=3 production pairs


def per_ray_needs(accel, o, d, sample):
    """numpy ordered-DFS per ray on the wide tree with REAL MT leaf
    pruning: (node_visits, leaf_visits) per sampled ray — what an ideal
    per-ray machine does."""
    cb = np.asarray(accel.cboxes, np.float64)
    cl = np.asarray(accel.clinks)          # (8, W)
    tris = np.asarray(accel.tris, np.float64)
    rpl = accel.rows_per_leaf
    ls = accel.leaf_size
    nv = np.zeros(len(sample), np.int64)
    lv = np.zeros(len(sample), np.int64)
    for si, ri in enumerate(sample):
        oo = o[ri].astype(np.float64)
        dd = d[ri].astype(np.float64)
        inv = np.where(dd == 0, 1e30, 1.0 / np.where(dd == 0, 1.0, dd))
        stack = [0]
        best = 3e38
        while stack:
            node = stack.pop()
            nv[si] += 1
            row = cb[node]
            for c in range(8):
                lo = np.array([row[c], row[8 + c], row[16 + c]])
                hi = np.array([row[24 + c], row[32 + c], row[40 + c]])
                t0 = (lo - oo) * inv
                t1 = (hi - oo) * inv
                tn = np.minimum(t0, t1).max()
                tf = np.maximum(t0, t1).min()
                if tn <= min(tf, best) and tf > 0:
                    link = cl[c, node]
                    if link >= 0:
                        stack.append(int(link))
                    elif link > -2147483647:
                        lv[si] += 1
                        leaf_row = -(int(link) + 1)
                        rows = tris[leaf_row:leaf_row + rpl]
                        for kk in range(ls):
                            rec = rows[kk // 4, 32 * (kk % 4):
                                       32 * (kk % 4) + 10]
                            p0, e1, e2 = rec[0:3], rec[3:6], rec[6:9]
                            pv = np.cross(dd, e2)
                            det = float(e1 @ pv)
                            if det <= 1e-12:
                                continue
                            tv = oo - p0
                            u = float(tv @ pv) / det
                            qv = np.cross(tv, e1)
                            vv_ = float(dd @ qv) / det
                            tt = float(e2 @ qv) / det
                            if (u >= 0 and vv_ >= 0 and u + vv_ <= 1
                                    and 1e-4 < tt < best):
                                best = tt
    return nv, lv


def report(name, fo, alive, accel, o_np, d_np):
    nv = np.asarray(fo["node_visits"]).reshape(-1, PAIR)[:, 0]
    lvv = np.asarray(fo["leaf_visits"]).reshape(-1, PAIR)[:, 0]
    a = np.asarray(alive).reshape(-1, PAIR)
    live_per_pair = a.sum(axis=1)
    live_pairs = live_per_pair > 0
    n_live = int(a.sum())
    tot_nodes = nv[live_pairs].sum()
    tot_leaves = lvv[live_pairs].sum()
    # per-ray needs on a live-ray sample
    rng = np.random.default_rng(0)
    live_idx = np.flatnonzero(np.asarray(alive))
    sample = rng.choice(live_idx, size=min(4000, len(live_idx)),
                        replace=False)
    pn, plv = per_ray_needs(accel, o_np, d_np, sample)
    print(f"{name}:")
    print(f"  pairs live {int(live_pairs.sum())}/{len(nv)}, "
          f"{n_live/1e6:.2f}M live rays")
    print(f"  per-pair node visits: mean {nv[live_pairs].mean():.0f} "
          f"p50 {np.percentile(nv[live_pairs],50):.0f} "
          f"p99 {np.percentile(nv[live_pairs],99):.0f} max {nv.max()}")
    print(f"  per-pair leaf visits: mean {lvv[live_pairs].mean():.0f} "
          f"p99 {np.percentile(lvv[live_pairs],99):.0f}")
    print(f"  per-RAY needs (sample): nodes mean {pn.mean():.1f} "
          f"p99 {np.percentile(pn,99):.0f}; leaves mean {plv.mean():.1f}")
    # union inflation: block work vs sum of per-ray needs it covers
    lanes = PAIR
    block_node_work = tot_nodes * lanes           # lane-slots spent
    ray_node_need = pn.mean() * n_live            # ideal lane-slots
    print(f"  union inflation (node lane-slots / ideal): "
          f"{block_node_work/ray_node_need:.1f}x  "
          f"(lane efficiency {100*ray_node_need/block_node_work:.1f}%)",
          flush=True)


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
    pn_ = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    poff = jnp.float32(-1.8)
    planes = Planes(normals=pn_[None], offsets=poff[None],
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
    def step_and_stats(o, d, alive, b):
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        fo = wide_shade_planes(accel, ox, oy, oz, dx, dy, dz,
                               alive.astype(jnp.float32), multi_pop=4,
                               n_inter=3, stats=True)
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
        o2 = jnp.stack([jnp.where(hit, ox + ts * dx, 1.0e7),
                        jnp.where(hit, oy + ts * dy, 1.0e7),
                        jnp.where(hit, oz + ts * dz, 1.0e7)], axis=1)
        d2s = jnp.stack([jnp.where(hit, d2[0], 0.0),
                         jnp.where(hit, d2[1], 0.0),
                         jnp.where(hit, d2[2], 1.0)], axis=1)
        return fo, o2, d2s, hit

    a0 = jnp.ones((N,), bool)
    fo0, o1, d1, a1 = step_and_stats(orig, dirn, a0, 0)
    jax.block_until_ready(o1)
    report("PRIMARY (film-tile)", fo0, a0, accel,
           np.asarray(orig), np.asarray(dirn))

    fo1, o2, d2, a2 = step_and_stats(o1, d1, a1, 1)
    jax.block_until_ready(o2)
    report("BOUNCE 1 (film-tile order)", fo1, a1, accel,
           np.asarray(o1), np.asarray(d1))

    # post-compact b2 state: row-sort by (morton, octant) + live pack
    o2n, d2n, a2n = np.asarray(o2), np.asarray(d2), np.asarray(a2)
    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    q = np.clip((o2n - lo) / np.maximum(hi - lo, 1e-6), 0, 1)
    cell = (q * 63).astype(np.int64)

    def spread3(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = ((spread3(cell[:, 0]) << 2) | (spread3(cell[:, 1]) << 1)
              | spread3(cell[:, 2]))
    octd = ((d2n[:, 0] > 0) * 4 + (d2n[:, 1] > 0) * 2
            + (d2n[:, 2] > 0)).astype(np.int64)
    keys = np.where(a2n, (morton << 3) | octd, 1 << 40)
    perm = np.argsort(keys, kind="stable")
    o2s = jnp.asarray(o2n[perm])
    d2s_ = jnp.asarray(d2n[perm])
    a2s = jnp.asarray(a2n[perm])
    fo2, _, _, _ = step_and_stats(o2s, d2s_, a2s, 2)
    jax.block_until_ready(fo2["t"])
    report("BOUNCE 2 (per-ray morton+octant packed)", fo2, a2s, accel,
           o2n[perm], d2n[perm])


if __name__ == "__main__":
    main()
