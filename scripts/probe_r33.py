"""Round-5 probe #33: treelet pair-binned traversal — planning numbers.

The round-4 closing measurement (probe_r32) showed the block union tax is
100-250x on bounces and every kernel-level lever is exhausted. The round-5
candidate mechanism routes (ray, treelet) PAIRS into treelet-pure blocks
that brute-force-stream a small dense triangle range (no stacks, no
syncs). Its viability hangs on two unknowns this probe measures on the
TRUE bounce-1 state (dragon+floor 139k, 4.15M rays):

1. CANDIDATE STATISTICS per treelet size (128/256/512 tris): how many
   treelet AABBs a real bounce ray pierces, and — with exact front-to-back
   early exit (walk treelets nearest-first, stop once best_t <= next
   entry) — how many pairs actually need walking. Sets K, the round
   structure, and the Phase B work volume.
2. XLA ROUTING PRIMITIVE COSTS at wavefront scale (argsort, random
   gather, scatter-iota inversion, cumsum): the pair binning must buy its
   walk savings back from these.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r33.py
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


def build_b1_state():
    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=139000, material=1),
        (0.0, 0.0, -4.0),
    )
    poff = jnp.float32(-1.8)
    planes = Planes(normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                    offsets=poff[None],
                    material_id=jnp.asarray([2], jnp.int32))
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(
        leaf_size=16,
        leaves_per_treelet=int(os.environ.get('PROBE_LPT', '16'))))
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
                               alive.astype(jnp.float32), multi_pop=4,
                               n_inter=3)
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
        return o2, d2s, hit

    a0 = jnp.ones((N,), bool)
    o1, d1, a1 = step(orig, dirn, a0, 0)
    jax.block_until_ready(o1)
    return scene, accel, np.asarray(o1), np.asarray(d1), np.asarray(a1)


def treelet_boxes_np(accel, leaves_per_treelet):
    """(T, 3) lo / (T, 3) hi from consecutive leaf windows of the shaded
    record array."""
    tris = np.asarray(accel.tris, np.float32)
    rpl = accel.rows_per_leaf
    ls = accel.leaf_size
    num_leaves = tris.shape[0] // rpl
    recs = tris.reshape(-1, 32)
    p0 = recs[:, 0:3]
    e1 = recs[:, 3:6]
    e2 = recs[:, 6:9]
    real = p0[:, 0] < 1.0e29
    v1, v2 = p0 + e1, p0 + e2
    lo = np.minimum(np.minimum(p0, v1), v2)
    hi = np.maximum(np.maximum(p0, v1), v2)
    lo[~real] = 1.0e30
    hi[~real] = -1.0e30
    tpt = leaves_per_treelet * ls
    T = -(-recs.shape[0] // tpt)
    pad = T * tpt - recs.shape[0]
    if pad:
        lo = np.concatenate([lo, np.full((pad, 3), 1.0e30, np.float32)])
        hi = np.concatenate([hi, np.full((pad, 3), -1.0e30, np.float32)])
    return (lo.reshape(T, tpt, 3).min(axis=1),
            hi.reshape(T, tpt, 3).max(axis=1))


def candidate_stats(accel, o, d, alive, leaves_per_treelet, sample_n=3000):
    """Per-ray treelet-candidate statistics + EXACT front-to-back early
    exit simulation on a live-ray sample (numpy, f64 slab / f32-ish MT)."""
    lo, hi = treelet_boxes_np(accel, leaves_per_treelet)
    T = lo.shape[0]
    tris = np.asarray(accel.tris, np.float64).reshape(-1, 32)
    tpt = leaves_per_treelet * accel.leaf_size
    rng = np.random.default_rng(0)
    live_idx = np.flatnonzero(alive)
    sample = rng.choice(live_idx, size=min(sample_n, len(live_idx)),
                        replace=False)
    n_cand = np.zeros(len(sample), np.int64)
    n_walked = np.zeros(len(sample), np.int64)
    for si, ri in enumerate(sample):
        oo = o[ri].astype(np.float64)
        dd = d[ri].astype(np.float64)
        inv = np.where(dd == 0, 1e30, 1.0 / np.where(dd == 0, 1.0, dd))
        t0 = (lo - oo) * inv
        t1 = (hi - oo) * inv
        tn = np.minimum(t0, t1).max(axis=1)
        tf = np.maximum(t0, t1).min(axis=1)
        hit = (tn <= tf) & (tf > 0)
        cands = np.flatnonzero(hit)
        n_cand[si] = len(cands)
        te = np.maximum(tn[cands], 0.0)
        order = np.argsort(te, kind="stable")
        best = 3e38
        walked = 0
        for t_id, t_entry in zip(cands[order], te[order]):
            if best <= t_entry:
                break
            walked += 1
            # brute-force MT over the treelet's records
            segr = tris[t_id * tpt:(t_id + 1) * tpt]
            p0 = segr[:, 0:3]
            e1 = segr[:, 3:6]
            e2 = segr[:, 6:9]
            pv = np.cross(np.broadcast_to(dd, p0.shape), e2)
            det = (e1 * pv).sum(1)
            ok = det > 1e-12
            invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            tv = oo - p0
            u = (tv * pv).sum(1) * invd
            qv = np.cross(tv, e1)
            vv = (qv * dd).sum(1) * invd
            tt = (e2 * qv).sum(1) * invd
            h = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > 1e-4)
            if h.any():
                best = min(best, tt[h].min())
        n_walked[si] = walked
    return T, n_cand, n_walked


def timed_chain(fn, arg, iters=8, reps=3, floor_ms=0.0):
    """Amortized on-device timing: fn applied ``iters`` times inside one
    jit with a data dependence. The multi-MB on-device result is synced
    with block_until_ready (large outputs are not async-acked by the
    relay); do NOT device_get — d2h over the tunnel costs ~100+ ms per
    17 MB array and would dominate (the round-1 version of this probe
    made exactly that mistake). Subtract the trivial-chain floor."""
    @jax.jit
    def chain(x, salt):
        # per-call salt: the relay caches repeat dispatches with
        # IDENTICAL arguments — every timed call must be unique
        def body(i, x):
            return fn(x, i + salt)
        return jax.lax.fori_loop(0, iters, body, x)

    def sync_run(salt):
        # a tiny d2h READ of the result is the only reliable sync here:
        # block_until_ready can return before the device ran anything
        # (relay async-ack), but a fetched VALUE must be real
        r = chain(arg, jnp.int32(salt))
        return np.asarray(jax.device_get(r[:8]))

    sync_run(12345)
    best = 1e30
    for rep in range(reps):
        t0 = time.perf_counter()
        sync_run(rep)
        best = min(best, time.perf_counter() - t0)
    return max(best * 1000.0 - floor_ms, 0.0) / iters


def routing_costs():
    for n in (4_153_600, 8_307_200):
        keys = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 543,
                                  dtype=jnp.int32)
        vals = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)
        perm = jax.random.permutation(jax.random.PRNGKey(3), n)
        # sort permutation of a REAL grouping key (543 bins over a
        # spatially coherent-ish source) — the gather locality the pair
        # binning actually sees, vs the fully random worst case
        gperm = jnp.argsort(keys, stable=True)

        floor = timed_chain(lambda x, i: x ^ i, keys) * 8.0
        print(f"  trivial chain floor n={n/1e6:.1f}M: {floor:7.1f} ms "
              f"(subtracted below)")
        ms = timed_chain(
            lambda x, i: jnp.argsort(x ^ i, stable=True) ^ i, keys,
            floor_ms=floor)
        print(f"  argsort i32 stable  n={n/1e6:.1f}M: {ms:7.1f} ms")
        ms = timed_chain(
            lambda x, i: x[perm] + i, vals, floor_ms=floor)
        print(f"  gather random perm  n={n/1e6:.1f}M: {ms:7.1f} ms")
        ms = timed_chain(
            lambda x, i: x[gperm] + i, vals, floor_ms=floor)
        print(f"  gather binned perm  n={n/1e6:.1f}M: {ms:7.1f} ms")
        ms = timed_chain(
            lambda x, i: jnp.zeros((n,), jnp.int32).at[perm].set(x) ^ i,
            jnp.arange(n, dtype=jnp.int32), floor_ms=floor)
        print(f"  scatter-iota inv    n={n/1e6:.1f}M: {ms:7.1f} ms")
        ms = timed_chain(lambda x, i: jnp.cumsum(x ^ i) ^ i, keys,
                         floor_ms=floor)
        print(f"  cumsum i32          n={n/1e6:.1f}M: {ms:7.1f} ms",
              flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    print("== XLA routing primitive costs (amortized, salted) ==")
    routing_costs()

    scene, accel, o1, d1, a1 = build_b1_state()
    print(f"\nb1 state: {a1.sum()/1e6:.2f}M live of {N/1e6:.2f}M")
    for lpt in (8, 16, 32):
        T, n_cand, n_walked = candidate_stats(accel, o1, d1, a1, lpt)
        tpt = lpt * accel.leaf_size
        print(f"treelet = {lpt} leaves ({tpt} tris), T = {T}:")
        print(f"  candidates/ray: mean {n_cand.mean():.2f} "
              f"p50 {np.percentile(n_cand,50):.0f} "
              f"p90 {np.percentile(n_cand,90):.0f} "
              f"p99 {np.percentile(n_cand,99):.0f} max {n_cand.max()}")
        print(f"  WALKED with exact front-to-back early exit: "
              f"mean {n_walked.mean():.2f} "
              f"p50 {np.percentile(n_walked,50):.0f} "
              f"p90 {np.percentile(n_walked,90):.0f} "
              f"p99 {np.percentile(n_walked,99):.0f} max {n_walked.max()}")
        print(f"  resolved after K pairs: "
              + " ".join(
                  f"K={k}: {100*(n_walked<=k).mean():.1f}%"
                  for k in (1, 2, 3, 4, 6, 8)), flush=True)


if __name__ == "__main__":
    main()


def row_gather_costs():
    """Row-gather economics: one (n, W) contiguous-row gather vs W
    per-plane gathers, plus the SoA->AoS pack needed to use it."""
    n = 4_153_600
    perm = jax.random.permutation(jax.random.PRNGKey(3), n)
    keys = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 543,
                              dtype=jnp.int32)
    floor = timed_chain(lambda x, i: x ^ i, keys) * 8.0
    print(f"  floor: {floor:.1f} ms")
    for w in (4, 8, 16, 32):
        tab = jax.random.normal(jax.random.PRNGKey(2), (n, w), jnp.float32)
        ms = timed_chain(lambda x, i: x[perm] + jnp.float32(0) * i, tab,
                         floor_ms=floor)
        print(f"  row gather (n,{w:2d}) by random perm: {ms:7.1f} ms "
              f"({ms/w:.2f} ms/plane-equiv)", flush=True)
    planes = jax.random.normal(jax.random.PRNGKey(2), (8, n), jnp.float32)

    def pack_unpack(x, i):
        aos = jnp.stack([x[k] + i for k in range(8)], axis=1)   # (n, 8)
        return aos.T                                            # back SoA
    ms = timed_chain(pack_unpack, planes, floor_ms=floor)
    print(f"  SoA->AoS(8)->SoA round trip: {ms:7.1f} ms")

    f64v = jax.lax.bitcast_convert_type(
        jax.random.normal(jax.random.PRNGKey(2), (n, 2), jnp.float32),
        jnp.float64).reshape(n)

    ms = timed_chain(lambda x, i: x[perm], f64v, floor_ms=floor)
    print(f"  gather f64 (2 packed planes):{ms:7.1f} ms", flush=True)


def block_range_sim(accel, o, d, alive, leaves_per_treelet, K=2):
    """Simulate the pair-binning routing variants and report per-block
    treelet-STREAM counts (the Phase B cost driver).

    Pairs live k-major (slot k*R + i). Variants:
      none     — no routing at all (blocks = 1024 consecutive slots)
      row      — rows of 128 slots reordered by row-min tid (cheap row
                 gather application, the compact_state machinery)
      nb+row   — 64-row-neighborhood lane sort by tid (banded kernel),
                 THEN global row reorder
      full     — per-pair global sort (expensive application; the bound)
    Phase B streams each 8-row block's CONTIGUOUS tid range [min, max].
    """
    lo, hi = treelet_boxes_np(accel, leaves_per_treelet)
    T = lo.shape[0]
    R = o.shape[0]
    BIG = np.int32(T + 1)
    tid_k = np.full((K, R), BIG, np.int32)
    chunk = 131072
    for c0 in range(0, R, chunk):
        c1 = min(c0 + chunk, R)
        oo = o[c0:c1]
        dd = d[c0:c1]
        inv = np.where(dd == 0, 1e30, 1.0 / np.where(dd == 0, 1.0, dd))
        t0 = (lo[None] - oo[:, None]) * inv[:, None]
        t1 = (hi[None] - oo[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        hit = (tn <= tf) & (tf > 0) & alive[c0:c1, None]
        te = np.where(hit, np.maximum(tn, 0.0), np.inf)
        part = np.argsort(te, axis=1)[:, :K]          # K nearest
        pe = np.take_along_axis(te, part, axis=1)
        tid_k[:, c0:c1] = np.where(np.isfinite(pe), part, BIG).T
    pair_tid = tid_k.reshape(-1)                      # (K*R,) k-major
    live_pairs = int((pair_tid <= T).sum())
    print(f"    live pairs {live_pairs/1e6:.2f}M of {K*R/1e6:.1f}M slots")

    def block_streams(tids):
        b = tids.reshape(-1, 1024)
        valid = b <= T
        anylive = valid.any(axis=1)
        bmin = np.where(anylive, np.where(valid, b, BIG).min(axis=1), 0)
        bmax = np.where(anylive, np.where(valid, b, -1).max(axis=1), -1)
        streams = np.maximum(bmax - bmin + 1, 0)
        return streams.sum(), anylive.sum(), np.percentile(
            streams[anylive], [50, 90, 99])

    def report(name, tids):
        s, nb_, pct = block_streams(tids)
        # 256-tri treelet stream ~= 5.6 us/block (VPU arithmetic bound)
        us = 5.6 * (leaves_per_treelet * 16 / 256.0)
        print(f"    {name:7s}: {int(s):7d} streams over {int(nb_):5d} "
              f"live blocks (p50/p90/p99 {pct[0]:.0f}/{pct[1]:.0f}/"
              f"{pct[2]:.0f})  -> ~{s*us/1000:.0f} ms phase B")

    report("none", pair_tid)

    rows = pair_tid.reshape(-1, 128)
    rmin = np.where(rows <= T, rows, BIG).min(axis=1)
    rperm = np.argsort(rmin, kind="stable")
    report("row", rows[rperm].reshape(-1))

    nb = 64 * 128
    nb_sorted = np.sort(pair_tid.reshape(-1, nb), axis=1).reshape(-1)
    rows2 = nb_sorted.reshape(-1, 128)
    rmin2 = np.where(rows2 <= T, rows2, BIG).min(axis=1)
    report("nb+row", rows2[np.argsort(rmin2, kind="stable")].reshape(-1))

    report("full", np.sort(pair_tid))
