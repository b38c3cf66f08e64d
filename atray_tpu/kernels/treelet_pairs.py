"""Two-phase (ray, treelet) pair-binned traversal — the round-5 answer
to the block-synchronous union tax.

The measured problem (probe_r32, docs/KERNELS.md): a bounce-1 traversal
block spends ~700 wide-node visits to serve lanes that individually need
~2.7 — 0.4% lane efficiency — because a block-synchronous walk visits the
UNION of its 1024 lanes' node needs, and every kernel-level lever
(sorting, packing, octant splits, kernel shape) measured closed. The
per-RAY work is tiny: on the true bounce-1 state, HALF the live rays
pierce zero treelet AABBs and the mean is 1.4 candidates (probe_r33).

Mechanism (three stages, no stacks, no per-node syncs):

  Phase A  (Pallas)  Every ray streams the packed treelet AABBs (8 per
                     128-lane row, same layout as the wide-node cboxes)
                     and keeps its K nearest candidates by entry
                     distance — pure branch-free VPU streaming.
  Binning  (XLA)     Pairs live K-MAJOR (slot k*R + i — concatenation,
                     never an AoS interleave). ONE stable argsort groups
                     live pairs by treelet id (argsort of i32 keys
                     measured 6.5 ms at 4.2M — the cheap primitive);
                     ONE batched (C, R)[:, idx] gather moves all ray
                     planes at single-plane cost (measured 29 ms for 8
                     planes at 4.2M indices vs 27 ms for one plane —
                     the round-5 discovery that makes routing
                     affordable; per-plane gathers and scatters are
                     4-40x worse).
  Phase B  (Pallas)  Blocks of 1024 binned pairs stream their lanes'
                     treelet RANGE [min_tid, max_tid] — after binning
                     that range is 1-3 treelets — testing each treelet's
                     256 dense records (identical Möller–Trumbore ops to
                     kernels/wide_shade.py's leaf phase, so winning hits
                     are bit-identical) with per-lane accept masks.

Exactness: Phase A's K slots are the K nearest candidates in (t_entry,
tid) lexicographic order; a ray is RESOLVED when its best hit is no
farther than the (K+1)-th candidate's entry (the reference's front-to-
back early-exit argument, kd_tree.cpp:337-465 — applied per ray, which
is exactly what the block-synchronous walk could not do). Unresolved
rays (deep candidate lists, or pairs dropped by the static pair cap)
fall back to the exact wide_shade kernel and take its result wholesale.

Reference parity anchor: replaces the per-ray early-exit efficiency of
/root/reference/Source/engine/renderer/kd_tree.cpp:337-465 on a SIMD
machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atray_tpu.accel.shaded import RECS_PER_ROW, STRIDE32, ShadedWideBVH
from atray_tpu.kernels.traverse_pallas import BLOCK_LANE

_INF = 3.0e38
_T_MIN = 1.0e-4


# ---------------------------------------------------------------------------
# Phase A: per-ray K-nearest treelet candidates
# ---------------------------------------------------------------------------


def _phase_a_kernel(
    rays_hbm,                       # ANY (7, rows, 128): o, d, alive
    flags_ref,                      # SMEM (num_pairs,) i32 any-live
    tbox_ref,                       # VMEM (t_rows, 128) packed AABBs
    sent_hbm,                       # ANY (K+1, rows, 128) aliased out
    out_hbm,                        # ANY (K+1, rows, 128)
    rblk_ref,                       # VMEM (7, S, 128)
    oblk_ref,                       # VMEM (K+1, S, 128)
    in_sem, out_sem,
    *, k_slots: int, t_rows: int, block_sub: int, num_pairs: int,
    num_treelets: int,
):
    S = block_sub
    del sent_hbm
    K = k_slots

    def process(pair, _):
        @pl.when(flags_ref[pair] == 1)
        def _():
            copy_in = pltpu.make_async_copy(
                rays_hbm.at[:, pl.ds(pair * S, S), :], rblk_ref, in_sem
            )
            copy_in.start()
            copy_in.wait()

            onesf = rblk_ref[0, 0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)

            def bc(x11):
                return x11 * onesf

            ox = rblk_ref[0]
            oy = rblk_ref[1]
            oz = rblk_ref[2]
            dx = rblk_ref[3]
            dy = rblk_ref[4]
            dz = rblk_ref[5]
            alive = rblk_ref[6] > 0.0
            big = jnp.float32(1.0e30)
            idx = jnp.where(dx == 0.0, big, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
            idy = jnp.where(dy == 0.0, big, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
            idz = jnp.where(dz == 0.0, big, 1.0 / jnp.where(dz == 0.0, 1.0, dz))
            inf = jnp.float32(_INF)

            def row_body(r, carry):
                tes = list(carry[: K + 1])
                tids = list(carry[K + 1:])
                row = tbox_ref[pl.ds(r, 1), :]
                for c in range(8):
                    blx = bc(row[:, c: c + 1])
                    bly = bc(row[:, 8 + c: 9 + c])
                    blz = bc(row[:, 16 + c: 17 + c])
                    bhx = bc(row[:, 24 + c: 25 + c])
                    bhy = bc(row[:, 32 + c: 33 + c])
                    bhz = bc(row[:, 40 + c: 41 + c])
                    tx0 = (blx - ox) * idx
                    tx1 = (bhx - ox) * idx
                    ty0 = (bly - oy) * idy
                    ty1 = (bhy - oy) * idy
                    tz0 = (blz - oz) * idz
                    tz1 = (bhz - oz) * idz
                    t_near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    t_far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    hit = (t_near <= t_far) & (t_far > 0.0) & alive
                    cand_te = jnp.where(hit, jnp.maximum(t_near, 0.0), inf)
                    cand_tid = (r * 8 + c).astype(jnp.float32)
                    cand_tid = jnp.where(hit, cand_tid, -1.0)
                    # insertion into the ascending (te, tid) slots.
                    # Candidates stream in tid order, and the STRICT
                    # compare keeps the incumbent on te ties — so the
                    # slots are exactly the K+1 lexicographically
                    # smallest (te, tid) pairs.
                    for k in range(K + 1):
                        better = cand_te < tes[k]
                        nte = jnp.where(better, cand_te, tes[k])
                        ntid = jnp.where(better, cand_tid, tids[k])
                        cand_te = jnp.where(better, tes[k], cand_te)
                        cand_tid = jnp.where(better, tids[k], cand_tid)
                        tes[k] = nte
                        tids[k] = ntid
                return tuple(tes) + tuple(tids)

            init = tuple(
                jnp.full((S, BLOCK_LANE), _INF, jnp.float32)
                for _ in range(K + 1)
            ) + tuple(
                jnp.full((S, BLOCK_LANE), -1.0, jnp.float32)
                for _ in range(K + 1)
            )
            fin = jax.lax.fori_loop(0, t_rows, row_body, init)
            for k in range(K):
                oblk_ref[k] = fin[K + 1 + k]       # tid planes
            oblk_ref[K] = fin[K]                   # bound: (K+1)-th te

            copy_out = pltpu.make_async_copy(
                oblk_ref, out_hbm.at[:, pl.ds(pair * S, S), :], out_sem
            )
            copy_out.start()
            copy_out.wait()

        return 0

    jax.lax.fori_loop(0, num_pairs, process, 0)


# ---------------------------------------------------------------------------
# Phase B: binned pairs stream their block's treelet range
# ---------------------------------------------------------------------------


def _phase_b_kernel(
    prs_hbm,                        # ANY (7, rows, 128): o, d, tidf
    flags_ref,                      # SMEM (num_pairs,) i32 any-valid
    ranges_ref,                     # SMEM (2, num_pairs) i32 tmin/tmax
    tris_ref,                       # VMEM (tri_rows, 128) shaded records
    sent_hbm,                       # ANY (6, rows, 128) aliased out
    out_hbm,                        # ANY (6, rows, 128)
    rblk_ref,                       # VMEM (7, S, 128)
    oblk_ref,                       # VMEM (6, S, 128)
    in_sem, out_sem,
    *, leaf_size: int, rows_per_leaf: int, lpt: int, block_sub: int,
    num_pairs: int,
):
    S = block_sub
    del sent_hbm
    rows_per_treelet = rows_per_leaf * lpt

    def process(pair, _):
        @pl.when(flags_ref[pair] == 1)
        def _():
            copy_in = pltpu.make_async_copy(
                prs_hbm.at[:, pl.ds(pair * S, S), :], rblk_ref, in_sem
            )
            copy_in.start()
            copy_in.wait()

            onesf = rblk_ref[0, 0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
            onesi = onesf.astype(jnp.int32)

            def bc(x11):
                return x11 * onesf

            ox = rblk_ref[0]
            oy = rblk_ref[1]
            oz = rblk_ref[2]
            dx = rblk_ref[3]
            dy = rblk_ref[4]
            dz = rblk_ref[5]
            tidf = rblk_ref[6]
            # the block's treelet stream range is precomputed on the XLA
            # side (two cheap reductions) — no vector->scalar syncs here
            tmin = ranges_ref[0, pair]
            tmax = ranges_ref[1, pair]

            oblk_ref[0] = jnp.full((S, BLOCK_LANE), _INF, jnp.float32)
            oblk_ref[1] = pltpu.bitcast(
                jnp.full((S, BLOCK_LANE), -1, jnp.int32), jnp.float32
            )
            for k in range(2, 6):
                oblk_ref[k] = jnp.zeros((S, BLOCK_LANE), jnp.float32)

            def tloop(t, _):
                # lanes whose pair targets treelet t accept hits from
                # this stream; everyone else is inert
                accept = tidf == t.astype(jnp.float32)
                t_b = oblk_ref[0]
                id_b = pltpu.bitcast(oblk_ref[1], jnp.int32)
                nx_b = oblk_ref[2]
                ny_b = oblk_ref[3]
                nz_b = oblk_ref[4]
                mat_b = oblk_ref[5]
                base = t * rows_per_treelet

                def rec_row(leaf, carry):
                    t_b, id_b, nx_b, ny_b, nz_b, mat_b = carry
                    # ONE dynamic slice per leaf, static addressing
                    # within — per-row dynamic reads measured ~3x slower
                    rows = tris_ref[
                        pl.ds(base + leaf * rows_per_leaf, rows_per_leaf), :
                    ]
                    for kk in range(leaf_size):
                        rr = kk // RECS_PER_ROW
                        bb = STRIDE32 * (kk % RECS_PER_ROW)
                        rec = rows[rr: rr + 1, bb: bb + STRIDE32]
                        # identical Möller–Trumbore ops to the
                        # wide_shade leaf phase — winning (t, id,
                        # normal, mat) are bit-identical per lane
                        p0x = bc(rec[:, 0:1])
                        p0y = bc(rec[:, 1:2])
                        p0z = bc(rec[:, 2:3])
                        e1x = bc(rec[:, 3:4])
                        e1y = bc(rec[:, 4:5])
                        e1z = bc(rec[:, 5:6])
                        e2x = bc(rec[:, 6:7])
                        e2y = bc(rec[:, 7:8])
                        e2z = bc(rec[:, 8:9])
                        fid_i = pltpu.bitcast(rec[:, 9:10], jnp.int32) * onesi
                        pvx = dy * e2z - dz * e2y
                        pvy = dz * e2x - dx * e2z
                        pvz = dx * e2y - dy * e2x
                        det = e1x * pvx + e1y * pvy + e1z * pvz
                        vld = det > jnp.float32(1.0e-12)
                        inv_det = jnp.where(
                            vld, 1.0 / jnp.where(vld, det, 1.0), 0.0
                        )
                        tvx = ox - p0x
                        tvy = oy - p0y
                        tvz = oz - p0z
                        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                        qvx = tvy * e1z - tvz * e1y
                        qvy = tvz * e1x - tvx * e1z
                        qvz = tvx * e1y - tvy * e1x
                        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                        hit = (
                            vld
                            & (uu >= 0.0)
                            & (vv >= 0.0)
                            & (uu + vv <= 1.0)
                            & (tt > jnp.float32(_T_MIN))
                            & (tt < t_b)
                            & accept
                        )
                        w0 = 1.0 - uu - vv
                        n0x = bc(rec[:, 10:11])
                        n0y = bc(rec[:, 11:12])
                        n0z = bc(rec[:, 12:13])
                        n1x = bc(rec[:, 13:14])
                        n1y = bc(rec[:, 14:15])
                        n1z = bc(rec[:, 15:16])
                        n2x = bc(rec[:, 16:17])
                        n2y = bc(rec[:, 17:18])
                        n2z = bc(rec[:, 18:19])
                        nx = w0 * n0x + uu * n1x + vv * n2x
                        ny = w0 * n0y + uu * n1y + vv * n2y
                        nz = w0 * n0z + uu * n1z + vv * n2z
                        t_b = jnp.where(hit, tt, t_b)
                        id_b = jnp.where(hit, fid_i, id_b)
                        nx_b = jnp.where(hit, nx, nx_b)
                        ny_b = jnp.where(hit, ny, ny_b)
                        nz_b = jnp.where(hit, nz, nz_b)
                        mat_b = jnp.where(hit, bc(rec[:, 19:20]), mat_b)
                    return (t_b, id_b, nx_b, ny_b, nz_b, mat_b)

                fin = jax.lax.fori_loop(
                    0, lpt, rec_row,
                    (t_b, id_b, nx_b, ny_b, nz_b, mat_b),
                )
                oblk_ref[0] = fin[0]
                oblk_ref[1] = pltpu.bitcast(fin[1], jnp.float32)
                oblk_ref[2] = fin[2]
                oblk_ref[3] = fin[3]
                oblk_ref[4] = fin[4]
                oblk_ref[5] = fin[5]
                return 0

            jax.lax.fori_loop(tmin, tmax + 1, tloop, 0)

            # normalize the winning interpolated normal once per block
            nx = oblk_ref[2]
            ny = oblk_ref[3]
            nz = oblk_ref[4]
            rlen = jax.lax.rsqrt(
                jnp.maximum(nx * nx + ny * ny + nz * nz, 1.0e-20)
            )
            oblk_ref[2] = nx * rlen
            oblk_ref[3] = ny * rlen
            oblk_ref[4] = nz * rlen

            copy_out = pltpu.make_async_copy(
                oblk_ref, out_hbm.at[:, pl.ds(pair * S, S), :], out_sem
            )
            copy_out.start()
            copy_out.wait()

        return 0

    jax.lax.fori_loop(0, num_pairs, process, 0)


def _pallas_common(interpret):
    return dict(
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("k_slots", "interpret", "block_sub")
)
def treelet_candidates(
    swbvh: ShadedWideBVH,
    ox, oy, oz, dx, dy, dz, alive_f,
    k_slots: int = 4,
    interpret: bool = False,
    block_sub: int = 8,
):
    """Phase A: per-ray K nearest treelet candidates.

    Returns (tids (K, R) f32 with -1 = none — ordered by entry distance —
    and bound (R,) f32 = entry distance of the (K+1)-th candidate, +INF
    when there is none). Dead rays have no candidates.
    """
    n = ox.shape[0]
    K = int(k_slots)
    block = block_sub * BLOCK_LANE
    pad = (-n) % block
    comps = [ox, oy, oz, dx, dy, dz]
    if pad:
        comps = [
            jnp.concatenate([c, jnp.broadcast_to(c[-1:], (pad,))])
            for c in comps
        ]
        alive_f = jnp.concatenate([alive_f, jnp.zeros((pad,), jnp.float32)])
    total = n + pad
    rows = total // BLOCK_LANE
    num_pairs = rows // block_sub

    rays = jnp.stack(
        [c.reshape(rows, BLOCK_LANE) for c in comps]
        + [alive_f.reshape(rows, BLOCK_LANE)]
    )
    flags = (
        jnp.max(alive_f.reshape(num_pairs, block), axis=1) > 0.0
    ).astype(jnp.int32)

    sentinel = jnp.concatenate([
        jnp.full((K, rows, BLOCK_LANE), -1.0, jnp.float32),
        jnp.full((1, rows, BLOCK_LANE), _INF, jnp.float32),
    ])

    t_rows = swbvh.tboxes.shape[0]
    out = pl.pallas_call(
        functools.partial(
            _phase_a_kernel,
            k_slots=K,
            t_rows=t_rows,
            block_sub=block_sub,
            num_pairs=num_pairs,
            num_treelets=swbvh.num_treelets,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((K + 1, rows, BLOCK_LANE),
                                       jnp.float32),
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((7, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.VMEM((K + 1, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        **_pallas_common(interpret),
    )(rays, flags, swbvh.tboxes, sentinel)

    flat = out.reshape(K + 1, -1)[:, :n]
    return flat[:K], flat[K]


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub"))
def treelet_pair_walk(
    swbvh: ShadedWideBVH,
    pox, poy, poz, pdx, pdy, pdz, ptidf,
    interpret: bool = False,
    block_sub: int = 8,
):
    """Phase B: binned pair slots -> (t, id, nx, ny, nz, mat) planes.

    ``ptidf`` is the pair's treelet id as f32 (-1 = dead slot). Slots
    must be grouped so each 1024-lane block spans a SMALL contiguous tid
    range — the kernel streams [block min tid, block max tid].
    """
    n = pox.shape[0]
    block = block_sub * BLOCK_LANE
    pad = (-n) % block
    comps = [pox, poy, poz, pdx, pdy, pdz, ptidf]
    if pad:
        fillers = [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, -1.0]
        comps = [
            jnp.concatenate([c, jnp.full((pad,), f, jnp.float32)])
            for c, f in zip(comps, fillers)
        ]
    total = n + pad
    rows = total // BLOCK_LANE
    num_pairs = rows // block_sub

    prs = jnp.stack([c.reshape(rows, BLOCK_LANE) for c in comps])
    tid_b = comps[6].reshape(num_pairs, block)
    flags = (jnp.max(tid_b, axis=1) >= 0.0).astype(jnp.int32)
    # per-block treelet stream range, computed here with two cheap
    # reductions so the kernel needs no vector->scalar syncs at all
    big = jnp.float32(1.0e9)
    tmin = jnp.min(jnp.where(tid_b >= 0.0, tid_b, big), axis=1)
    tmax = jnp.max(tid_b, axis=1)
    ranges = jnp.stack([
        jnp.where(flags == 1, tmin, 0.0).astype(jnp.int32),
        jnp.where(flags == 1, tmax, -1.0).astype(jnp.int32),
    ])

    neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    sentinel = jnp.concatenate([
        jnp.full((1, rows, BLOCK_LANE), _INF, jnp.float32),
        jnp.broadcast_to(neg1, (1, rows, BLOCK_LANE)),
        jnp.zeros((4, rows, BLOCK_LANE), jnp.float32),
    ])

    out = pl.pallas_call(
        functools.partial(
            _phase_b_kernel,
            leaf_size=swbvh.leaf_size,
            rows_per_leaf=swbvh.rows_per_leaf,
            lpt=swbvh.leaves_per_treelet,
            block_sub=block_sub,
            num_pairs=num_pairs,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((6, rows, BLOCK_LANE), jnp.float32),
        input_output_aliases={4: 0},
        scratch_shapes=[
            pltpu.VMEM((7, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.VMEM((6, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        **_pallas_common(interpret),
    )(prs, flags, ranges, swbvh.tris, sentinel)

    flat = out.reshape(6, -1)[:, :n]
    return {
        "t": flat[0],
        "id": jax.lax.bitcast_convert_type(flat[1], jnp.int32),
        "nx": flat[2],
        "ny": flat[3],
        "nz": flat[4],
        "mat": flat[5].astype(jnp.int32),
    }


@functools.partial(
    jax.jit,
    static_argnames=("k_slots", "cap_frac", "interpret", "residual",
                     "n_inter", "multi_pop"),
)
def treelet_pair_hit(
    swbvh: ShadedWideBVH,
    ox, oy, oz, dx, dy, dz,
    alive_f,
    k_slots: int = 4,
    cap_frac: float = 0.5,
    interpret: bool = False,
    residual: bool = True,
    n_inter: int = 3,
    multi_pop: int = 4,
):
    """Exact nearest triangle hit via pair binning; same contract as
    ``wide_shade_planes`` (dict of flat planes; miss = INF/-1/0/0).

    ``cap_frac`` sets the static pair budget as a fraction of R; rays
    whose pairs exceed the cap — or whose candidate list extends past
    ``k_slots`` with no terminating hit — are re-resolved exactly by the
    fallback ``wide_shade_planes`` call (``residual=True``).
    """
    from atray_tpu.kernels.wide_shade import wide_shade_planes

    R = ox.shape[0]
    K = int(k_slots)

    tids, bound = treelet_candidates(
        swbvh, ox, oy, oz, dx, dy, dz, alive_f,
        k_slots=K, interpret=interpret,
    )

    T = swbvh.num_treelets
    BIGK = jnp.int32(T + 1)
    # k-major pair keys: slot k*R + i holds ray i's k-th candidate
    keys = jnp.concatenate([
        jnp.where(tids[k] >= 0.0, tids[k].astype(jnp.int32), BIGK)
        for k in range(K)
    ])
    perm = jnp.argsort(keys, stable=True)

    cap = max(BLOCK_LANE * 8, (int(R * cap_frac) // (BLOCK_LANE * 8))
              * (BLOCK_LANE * 8))
    cap = min(cap, K * R)
    sel = perm[:cap]
    rid = sel % R
    selkey = keys[sel]
    ptidf = jnp.where(selkey < BIGK, selkey.astype(jnp.float32), -1.0)

    # ONE batched gather moves all six ray planes to pair order
    rays6 = jnp.stack([ox, oy, oz, dx, dy, dz])
    pb = rays6[:, rid]

    res = treelet_pair_walk(
        swbvh, pb[0], pb[1], pb[2], pb[3], pb[4], pb[5], ptidf,
        interpret=interpret,
    )

    # Route pair results back to k-major slots. Two wirings:
    # - big wavefronts: sort the WALKED pairs by slot index (a cheap
    #   cap-sized argsort) and lane_scatter them — the destination map
    #   is monotone injective with a <=2-row band, and a 7th "routed"
    #   marker plane identifies untargeted slots, which removes the
    #   K*R-sized inverse argsort AND the K*R-index gather entirely
    #   (together ~90 ms/chunk at the b1 scale, the largest single
    #   routing cost). Ids/mats ride as exact f32 VALUES (< 2^24) —
    #   never NaN bitcasts through the one-hot matmul.
    # - small wavefronts (tests): inverse-permutation batched gather.
    from atray_tpu.kernels.lane_pack import _stream_slab_rows

    slot_rows = (K * R) // BLOCK_LANE
    use_scatter_wb = (
        not (K * R) % BLOCK_LANE
        and cap % BLOCK_LANE == 0
        and slot_rows >= 2048
        and _stream_slab_rows(slot_rows, 64) != 0
    )
    res7 = jnp.stack([
        res["t"],
        res["id"].astype(jnp.float32),
        res["nx"], res["ny"], res["nz"],
        res["mat"].astype(jnp.float32),
        jnp.ones((cap,), jnp.float32),            # routed marker
    ])
    if use_scatter_wb:
        from atray_tpu.kernels.lane_pack import lane_scatter

        perm2 = jnp.argsort(sel)
        dst = jnp.concatenate([
            sel[perm2],
            jnp.full((K * R - cap,), -1, sel.dtype),
        ]).astype(jnp.int32)
        cols = jnp.concatenate([
            res7[:, perm2].reshape(7, cap // BLOCK_LANE, BLOCK_LANE),
            jnp.zeros((7, slot_rows - cap // BLOCK_LANE, BLOCK_LANE),
                      jnp.float32),
        ], axis=1)
        sc = lane_scatter(cols, dst, wcap=64, interpret=interpret)
        routed = sc[6].reshape(-1) > 0.5
        res_slots = jnp.stack([
            jnp.where(routed, sc[0].reshape(-1), _INF),
            jnp.where(routed, sc[1].reshape(-1), -1.0),
            sc[2].reshape(-1), sc[3].reshape(-1), sc[4].reshape(-1),
            sc[5].reshape(-1),
        ])
        dropped = (keys < BIGK) & ~routed
    else:
        inv = jnp.argsort(perm)               # slot -> sorted position
        miss_col = jnp.stack([
            jnp.float32(_INF), jnp.float32(-1.0),
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(0.0),
        ])[:, None]
        res7p = jnp.concatenate([res7, miss_col], axis=1)
        slot_idx = jnp.where(inv < cap, inv, cap)
        res_slots = res7p[:6, slot_idx]           # (6, K*R)
        dropped = (keys < BIGK) & (inv >= cap)

    # per-ray combine: slots are ordered by entry distance, so iterate
    # k ascending with a STRICT compare — nearest-entry wins ties,
    # matching the front-to-back convention
    best_t = jnp.full((R,), _INF)
    best_id = jnp.full((R,), -1, jnp.int32)
    best_nx = jnp.zeros((R,))
    best_ny = jnp.zeros((R,))
    best_nz = jnp.zeros((R,))
    best_mat = jnp.zeros((R,), jnp.int32)
    drop_any = jnp.zeros((R,), bool)
    for k in range(K):
        sl = slice(k * R, (k + 1) * R)
        tk = res_slots[0, sl]
        closer = tk < best_t
        best_t = jnp.where(closer, tk, best_t)
        best_id = jnp.where(
            closer, res_slots[1, sl].astype(jnp.int32), best_id
        )
        best_nx = jnp.where(closer, res_slots[2, sl], best_nx)
        best_ny = jnp.where(closer, res_slots[3, sl], best_ny)
        best_nz = jnp.where(closer, res_slots[4, sl], best_nz)
        best_mat = jnp.where(
            closer, res_slots[5, sl].astype(jnp.int32), best_mat
        )
        drop_any = drop_any | dropped[sl]

    alive = alive_f > 0.0
    unresolved = alive & ((bound < best_t) | drop_any)

    out = {
        "t": best_t,
        "id": best_id,
        "nx": best_nx,
        "ny": best_ny,
        "nz": best_nz,
        "mat": best_mat,
    }
    if not residual:
        return out, unresolved

    # Exact fallback for the unresolved tail: the wide kernel re-walks
    # those rays from scratch and its result is taken wholesale. The
    # unresolved rays are SCATTERED (deep candidate lists occur all over
    # the film), so feeding them in place makes nearly every block
    # traverse for a couple of lanes — measured +340 ms at b1. They are
    # lane-PACKED to a dense prefix first (the round-3 banded router),
    # so only ~unres%% of blocks walk, and results route back by the
    # inverse take. Ids/mats ride as exact f32 VALUES (< 2^24), never
    # NaN bitcasts — the one-hot matmul may canonicalize NaN payloads.
    unres_f = unresolved.astype(jnp.float32)
    orig_unresolved = unresolved
    use_pack = (R % (8 * BLOCK_LANE) == 0) and R >= 16 * 8 * BLOCK_LANE
    merged = dict(out)
    if use_pack:
        # argsort-based compaction: the banded lane router is ILLEGAL
        # here (unresolved rays are scattered with long empty stretches,
        # so a packed output row can draw from far more than its window
        # — the first wiring silently zeroed ~2% of the residuals).
        # A sort-permutation gather is legal for ANY distribution.
        Rp = max(8 * BLOCK_LANE, R // 4)
        order = jnp.argsort(
            jnp.where(unresolved, 0, 1).astype(jnp.int32), stable=True
        )[:Rp]
        rays7 = jnp.stack([ox, oy, oz, dx, dy, dz, unres_f])
        pk = rays7[:, order]                   # one batched gather
        al_p = pk[6]
        old = wide_shade_planes(
            swbvh,
            jnp.where(al_p > 0.0, pk[0], 1.0e7),
            jnp.where(al_p > 0.0, pk[1], 1.0e7),
            jnp.where(al_p > 0.0, pk[2], 1.0e7),
            jnp.where(al_p > 0.0, pk[3], 0.0),
            jnp.where(al_p > 0.0, pk[4], 0.0),
            jnp.where(al_p > 0.0, pk[5], 1.0),
            al_p,
            interpret=interpret, n_inter=n_inter, multi_pop=multi_pop,
        )
        res7 = jnp.stack([
            old["t"], old["id"].astype(jnp.float32),
            old["nx"], old["ny"], old["nz"],
            old["mat"].astype(jnp.float32),
        ])
        res7p = jnp.concatenate(
            [res7, jnp.zeros((6, 1), jnp.float32)], axis=1)
        rank = jnp.cumsum(unresolved.astype(jnp.int32)) - 1
        back_idx = jnp.where(unresolved & (rank < Rp), rank, Rp)
        back = res7p[:, back_idx]              # one batched gather
        fixed = unresolved & (rank < Rp)
        merged = {
            "t": jnp.where(fixed, back[0], out["t"]),
            "id": jnp.where(fixed, back[1].astype(jnp.int32), out["id"]),
            "nx": jnp.where(fixed, back[2], out["nx"]),
            "ny": jnp.where(fixed, back[3], out["ny"]),
            "nz": jnp.where(fixed, back[4], out["nz"]),
            "mat": jnp.where(fixed, back[5].astype(jnp.int32),
                             out["mat"]),
        }
        # overflow guard (> Rp unresolved rays — does not happen at the
        # production cap/K, but exactness must not depend on that):
        # whatever did not fit runs through the plain unpacked fallback,
        # which is all-dead (and skips in a few ms) in the normal case
        unresolved = unresolved & (rank >= Rp)
        unres_f = unresolved.astype(jnp.float32)
    old = wide_shade_planes(
        swbvh, ox, oy, oz, dx, dy, dz, unres_f,
        interpret=interpret, n_inter=n_inter, multi_pop=multi_pop,
    )
    merged = {
        "t": jnp.where(unresolved, old["t"], merged["t"]),
        "id": jnp.where(unresolved, old["id"], merged["id"]),
        "nx": jnp.where(unresolved, old["nx"], merged["nx"]),
        "ny": jnp.where(unresolved, old["ny"], merged["ny"]),
        "nz": jnp.where(unresolved, old["nz"], merged["nz"]),
        "mat": jnp.where(unresolved, old["mat"], merged["mat"]),
    }
    return merged, orig_unresolved
