"""Fused traversal + shading-data kernel (the forward-path workhorse).

Identical traversal to kernels/wide_exact2.py (interleaved exact wide-BVH
walk), but leaf records are the stride-32 SHADED layout of accel/shaded.py:
at every candidate-triangle test the record's vertex normals are already in
registers, so a winning hit updates not just (t, id) but the barycentrically
interpolated shading normal and the MATERIAL ID — per ray, as pure vector
selects.

Output planes per ray (f32): [t, id(bitcast), nx, ny, nz, mat]. The
renderer's fast path consumes these directly: the forward pass performs
ZERO per-ray gathers (XLA row gathers measured ~250 M elem/s on v5e were
the frame bottleneck). Material CONSTANTS (emission/albedo/scatter) are
resolved OUTSIDE the kernel from the material id with a select chain over
the (tiny) material table — round 4 measured the in-kernel per-candidate
material selects + broadcasts at ~20% of the leaf phase, and leaves
dominate incoherent bounces. The interpolated normal is likewise stored
UNNORMALIZED per candidate and normalized once per block at write-out
(same ops on the same winning values — bit-identical, amortized).

Gradients: ``wavefront.make_fused_hit_shade`` wraps this in a
``jax.custom_vjp`` whose backward replays the differentiable resolve from
the face id (path replay) — that wrapper is the production entry point.
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
STACK_CAP = 192
NOUT = 6


def _wide_shade_kernel(
    rays_hbm,                        # ANY (7, rows, 128): o, d, alive
    flags_ref,                       # SMEM (num_pairs*n_inter,) i32:
                                     #   bit0-2 dir signs, bit3 any-live
    cboxes_ref, clinks_ref, caxis_ref, tris_ref,
    sent_hbm,                        # ANY (NOUT, rows, 128) — aliased to out
    out_hbm,                         # ANY (NOUT, rows, 128)
    rblk_ref,                        # VMEM (7, n_inter*S, 128)
    oblk_ref,                        # VMEM (NOUT, n_inter*S, 128)
    stacks_ref,                      # SMEM (n_inter, stack_cap)
    in_sem, out_sem,
    *, leaf_size: int, rows_per_leaf: int, block_sub: int, num_pairs: int,
    octant_split: bool, multi_pop: int, n_inter: int, ordered: bool,
    stats: bool = False,
):
    S = block_sub
    del sent_hbm  # aliased storage: skipped pairs keep their sentinels

    def process_pair(pair, _):
        # per-half flags were computed ON THE HOST PROGRAM side (cheap XLA
        # reductions): liveness and direction signs as SMEM scalars. A
        # fully dead pair is skipped HERE, before any DMA/init/sync — the
        # post-compaction tail of a sparse wavefront costs ~nothing
        # (previously every dead pair paid the DMAs, 12 plane inits and
        # ~8 vector->scalar syncs: the measured late-bounce floor).
        fl = [flags_ref[pair * n_inter + i] for i in range(n_inter)]
        pair_live = (fl[0] >> 3) & 1
        for i in range(1, n_inter):
            pair_live = pair_live | ((fl[i] >> 3) & 1)

        @pl.when(pair_live == 1)
        def _():
            _process_live_pair(pair, fl)

        return 0

    def _process_live_pair(pair, fl):
        copy_in = pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(pair * n_inter * S, n_inter * S), :],
            rblk_ref,
            in_sem,
        )
        copy_in.start()
        copy_in.wait()

        onesf = rblk_ref[0, 0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
        onesi = onesf.astype(jnp.int32)

        def bc(x11, ones):
            return x11 * ones

        def fold(m):
            """Union a per-lane bitmask (S, 128) over all lanes: every
            lane ends up holding OR of the whole block — one value to
            extract to the scalar core."""
            s = m.shape[0]
            while s > 1:
                m = m[: s // 2] | m[s // 2 : 2 * (s // 2)]
                s //= 2
            for sh in (64, 32, 16, 8, 4, 2, 1):
                m = m | pltpu.roll(m, shift=sh, axis=1)
            return m

        inf = jnp.float32(_INF)
        # dead lanes start with best_t = -INF: no box can satisfy
        # t_near <= min(t_far, best_t) and no triangle tt < best_t, so
        # they are inert with NO per-op mask ANDs (the write-out below
        # restores their +INF miss sentinel)
        alive_plane = rblk_ref[6]
        oblk_ref[0] = jnp.where(alive_plane > 0.0, inf, -inf)
        oblk_ref[1] = pltpu.bitcast(
            jnp.full((n_inter * S, BLOCK_LANE), -1, jnp.int32), jnp.float32
        )
        for k in range(2, NOUT):
            oblk_ref[k] = jnp.zeros((n_inter * S, BLOCK_LANE), jnp.float32)

        def make_block(half: int, mask):
            """Traversal closures for one half; ``mask`` is None for the
            production single-pass walk (dead lanes are inert via the
            -INF best_t plane) or an (S, 128) bool selecting the lanes of
            THIS pass (octant-split traversal runs 8 masked passes so
            each block-wide union only spans same-octant lanes)."""
            lo = half * S
            ox = rblk_ref[0, lo : lo + S]
            oy = rblk_ref[1, lo : lo + S]
            oz = rblk_ref[2, lo : lo + S]
            dx = rblk_ref[3, lo : lo + S]
            dy = rblk_ref[4, lo : lo + S]
            dz = rblk_ref[5, lo : lo + S]
            big = jnp.float32(1.0e30)
            idx = jnp.where(dx == 0.0, big, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
            idy = jnp.where(dy == 0.0, big, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
            idz = jnp.where(dz == 0.0, big, 1.0 / jnp.where(dz == 0.0, 1.0, dz))
            def raymask(node):
                row = cboxes_ref[pl.ds(node, 1), :]
                best_t = oblk_ref[0, lo : lo + S]
                rm = jnp.zeros((S, BLOCK_LANE), jnp.int32)
                for c in range(8):
                    blx = bc(row[:, c : c + 1], onesf)
                    bly = bc(row[:, 8 + c : 9 + c], onesf)
                    blz = bc(row[:, 16 + c : 17 + c], onesf)
                    bhx = bc(row[:, 24 + c : 25 + c], onesf)
                    bhy = bc(row[:, 32 + c : 33 + c], onesf)
                    bhz = bc(row[:, 40 + c : 41 + c], onesf)
                    tx0 = (blx - ox) * idx
                    tx1 = (bhx - ox) * idx
                    ty0 = (bly - oy) * idy
                    ty1 = (bhy - oy) * idy
                    tz0 = (blz - oz) * idz
                    tz1 = (bhz - oz) * idz
                    t_near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    t_far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    # conservative merge: t_near <= min(t_far, best_t)
                    # admits the t_near == best_t boundary (an extra node
                    # visit at most — leaf hits still need tt < best_t)
                    bhit = (t_near <= jnp.minimum(t_far, best_t)) & (
                        t_far > 0.0
                    )
                    if mask is not None:
                        bhit = bhit & mask
                    rm = rm | jnp.where(bhit, jnp.int32(1 << c), 0)
                return rm   # per-lane 8-bit child-hit mask, NOT yet unioned

            def leaf_phase(leaf_row):
                t_b = oblk_ref[0, lo : lo + S]
                id_b = pltpu.bitcast(oblk_ref[1, lo : lo + S], jnp.int32)
                nx_b = oblk_ref[2, lo : lo + S]
                ny_b = oblk_ref[3, lo : lo + S]
                nz_b = oblk_ref[4, lo : lo + S]
                mat_b = oblk_ref[5, lo : lo + S]
                rows = tris_ref[pl.ds(leaf_row, rows_per_leaf), :]
                for kk in range(leaf_size):
                    rr = kk // RECS_PER_ROW
                    base = STRIDE32 * (kk % RECS_PER_ROW)
                    rec = rows[rr : rr + 1, base : base + STRIDE32]
                    p0x = bc(rec[:, 0:1], onesf)
                    p0y = bc(rec[:, 1:2], onesf)
                    p0z = bc(rec[:, 2:3], onesf)
                    e1x = bc(rec[:, 3:4], onesf)
                    e1y = bc(rec[:, 4:5], onesf)
                    e1z = bc(rec[:, 5:6], onesf)
                    e2x = bc(rec[:, 6:7], onesf)
                    e2y = bc(rec[:, 7:8], onesf)
                    e2z = bc(rec[:, 8:9], onesf)
                    fid = bc(pltpu.bitcast(rec[:, 9:10], jnp.int32), onesi)
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    valid = det > jnp.float32(1.0e-12)
                    inv_det = jnp.where(
                        valid, 1.0 / jnp.where(valid, det, 1.0), 0.0
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
                        valid
                        & (uu >= 0.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > jnp.float32(_T_MIN))
                        & (tt < t_b)
                    )
                    if mask is not None:
                        hit = hit & mask
                    # interpolated shading normal of this candidate,
                    # stored UNNORMALIZED: the winner is normalized once
                    # per block at write-out (identical ops on identical
                    # values -> bit-identical, but paid per block instead
                    # of per candidate)
                    w0 = 1.0 - uu - vv
                    n0x = bc(rec[:, 10:11], onesf)
                    n0y = bc(rec[:, 11:12], onesf)
                    n0z = bc(rec[:, 12:13], onesf)
                    n1x = bc(rec[:, 13:14], onesf)
                    n1y = bc(rec[:, 14:15], onesf)
                    n1z = bc(rec[:, 15:16], onesf)
                    n2x = bc(rec[:, 16:17], onesf)
                    n2y = bc(rec[:, 17:18], onesf)
                    n2z = bc(rec[:, 18:19], onesf)
                    nx = w0 * n0x + uu * n1x + vv * n2x
                    ny = w0 * n0y + uu * n1y + vv * n2y
                    nz = w0 * n0z + uu * n1z + vv * n2z
                    t_b = jnp.where(hit, tt, t_b)
                    id_b = jnp.where(hit, fid, id_b)
                    nx_b = jnp.where(hit, nx, nx_b)
                    ny_b = jnp.where(hit, ny, ny_b)
                    nz_b = jnp.where(hit, nz, nz_b)
                    mat_b = jnp.where(hit, bc(rec[:, 19:20], onesf), mat_b)
                oblk_ref[0, lo : lo + S] = t_b
                oblk_ref[1, lo : lo + S] = pltpu.bitcast(id_b, jnp.float32)
                oblk_ref[2, lo : lo + S] = nx_b
                oblk_ref[3, lo : lo + S] = ny_b
                oblk_ref[4, lo : lo + S] = nz_b
                oblk_ref[5, lo : lo + S] = mat_b

            return raymask, leaf_phase

        def scalar_phase(half, live, sp_popped, mask, node, leaf_fn, desc):
            """Ordered push: children are build-sorted by centroid
            ascending along ``caxis[node]``; ``desc`` (i32 0/1) is 1 when
            the block's dominant direction is positive along that axis,
            so iterating 7..0 pushes far children first and the stack
            pops near-first — best_t tightens early and far subtrees
            prune (Embree-style ordered traversal, one axis per node).
            ``desc=None`` (static) skips the order math entirely — for
            incoherent blocks whose lanes disagree on sign, the per-node
            scalar ordering costs more than its pruning saves (measured
            -15%, docs/KERNELS.md)."""
            sp = sp_popped
            _spill = stacks_ref.shape[1] - 1   # garbage slot, never popped
            # desc in {0,1}: 7-cc == cc ^ 7 for 3-bit cc
            d7 = 0 if desc is None else desc * 7
            leaf_inc = jnp.int32(0)    # leaf visits (DCE'd unless stats)
            for cc in range(8):
                c = cc ^ d7
                link = clinks_ref[c, node]
                hit_c = live & (((mask >> c) & 1) == 1)
                is_node = hit_c & (link >= 0)
                is_leaf = hit_c & (link < 0) & (link > -2147483647)
                leaf_inc = leaf_inc + is_leaf.astype(jnp.int32)

                # BRANCHLESS push (round 4): the store happens
                # UNCONDITIONALLY; a non-push is redirected to a dedicated
                # SPILL slot (top of the allocated slack) by a scalar
                # select on the ADDRESS. Replaces a scalar branch per
                # child (8 per node — the walk is scalar-latency bound,
                # docs/KERNELS.md lesson 7). An sp-targeted store is NOT
                # safe to leave ungated: the multi-pop batch path calls
                # scalar_phase with live=False for shallow stacks and a
                # garbage store at its base would clobber LIVE entries
                # pushed by earlier batches of the same iteration.
                idx = jnp.where(is_node, sp, _spill)
                stacks_ref[half, idx] = link
                sp = sp + is_node.astype(jnp.int32)

                @pl.when(is_leaf)
                def _(link=link, leaf_fn=leaf_fn):
                    leaf_fn(-(link + 1))

            return sp, leaf_inc

        def run_pass(masks, live_scalars=None):
            """One interleaved ``n_inter``-block traversal. All halves'
            mask pipelines issue before any half's scalar extract, so the
            ~1 us vector→scalar syncs of up to ``n_inter`` independent
            walks overlap (docs/KERNELS.md lesson 1). ``live_scalars``
            (production path) are the precomputed SMEM liveness bits —
            a dead half starts with an empty stack at ZERO vector→scalar
            syncs (dead-block skip — the wavefront analog of the
            reference's per-ray early break, renderer.cpp:227-231); the
            octant-split path passes None and pays a vector max per
            masked pass."""
            blocks = [make_block(i, masks[i]) for i in range(n_inter)]
            rm = [b[0] for b in blocks]
            leaf = [b[1] for b in blocks]

            if ordered:
                # direction signs were reduced host-program-side into the
                # SMEM flags (bits 0-2) — no per-pass vector sums/syncs
                sgn = [
                    ((fl[i] >> 0) & 1, (fl[i] >> 1) & 1, (fl[i] >> 2) & 1)
                    for i in range(n_inter)
                ]

                def desc_of(node, sg):
                    axis = caxis_ref[0, node]
                    return jnp.where(
                        axis == 0, sg[0], jnp.where(axis == 1, sg[1], sg[2])
                    )
            else:
                sgn = [None] * n_inter

                def desc_of(node, sg):
                    return None

            def wcond(state):
                alive = state[0] > 0
                for sp in state[1:n_inter]:
                    alive = alive | (sp > 0)
                return alive

            def wbody(state):
                sps = state[:n_inter]
                live = [sp > 0 for sp in sps]
                pops = [jnp.maximum(sp - 1, 0) for sp in sps]
                nodes = [stacks_ref[i, pops[i]] for i in range(n_inter)]
                # all mask pipelines issue before any scalar extract
                rows = [fold(rm[i](nodes[i])) for i in range(n_inter)]
                ms = [row[0, 0] for row in rows]
                out = [
                    scalar_phase(i, live[i], pops[i], ms[i], nodes[i],
                                 leaf[i], desc_of(nodes[i], sgn[i]))
                    for i in range(n_inter)
                ]
                new_sps = tuple(
                    jnp.where(live[i], out[i][0], sps[i])
                    for i in range(n_inter)
                )
                if not stats:
                    return new_sps
                nc, lc = state[n_inter], state[n_inter + 1]
                for i in range(n_inter):
                    nc = nc + live[i].astype(jnp.int32)
                    lc = lc + jnp.where(live[i], out[i][1], 0)
                return new_sps + (nc, lc)

            def wbody_multi(state):
                """Multi-pop iteration: up to ``multi_pop`` nodes per half
                are expanded per vector→scalar round trip. The ~1 us
                extract sync is the traversal currency (docs/KERNELS.md
                lesson 1); packing K 8-bit child masks into ceil(K/4)
                i32 planes pays ONE pipeline stall (plus cheap extra
                extracts of already-computed vectors) for K nodes.
                Invalid pops (stack shallower than K) are masked to zero
                in the vector domain."""
                K = multi_pop
                npk = (K + 3) // 4
                sps = state[:n_inter]
                live = [sp > 0 for sp in sps]
                nodes = [
                    [stacks_ref[i, jnp.maximum(sps[i] - 1 - k, 0)]
                     for k in range(K)]
                    for i in range(n_inter)
                ]
                packs = []
                for i in range(n_inter):
                    pks = [
                        jnp.zeros((S, BLOCK_LANE), jnp.int32)
                        for _ in range(npk)
                    ]
                    for k in range(K):
                        # NOTE (round 4): branching out the mask pipeline
                        # for absent stack entries (lax.cond on sp > k)
                        # measured 7% SLOWER end-to-end — the scalar
                        # branch stalls the issue-ahead pipelining that
                        # multi-pop exists to exploit. The masked-compute
                        # form stays.
                        mk = jnp.where(sps[i] > k, rm[i](nodes[i][k]), 0)
                        pks[k // 4] = pks[k // 4] | (mk << (8 * (k % 4)))
                    packs.append(pks)
                ms = [[fold(pk)[0, 0] for pk in pks] for pks in packs]
                bases = [jnp.maximum(sp - K, 0) for sp in sps]
                leaf_incs = []
                # reverse batch order so the nearest popped node's children
                # land on top of the stack (preserves near-first popping)
                for k in reversed(range(K)):
                    for i in range(n_inter):
                        ok = sps[i] > k
                        new_sp, lcd = scalar_phase(
                            i, ok, bases[i],
                            (ms[i][k // 4] >> (8 * (k % 4))) & 255,
                            nodes[i][k], leaf[i],
                            desc_of(nodes[i][k], sgn[i]),
                        )
                        bases[i] = jnp.where(ok, new_sp, bases[i])
                        leaf_incs.append(jnp.where(ok, lcd, 0))
                new_sps = tuple(
                    jnp.where(live[i], bases[i], sps[i])
                    for i in range(n_inter)
                )
                if not stats:
                    return new_sps
                nc, lc = state[n_inter], state[n_inter + 1]
                for i in range(n_inter):
                    for k in range(K):
                        nc = nc + (sps[i] > k).astype(jnp.int32)
                for lcd in leaf_incs:
                    lc = lc + lcd
                return new_sps + (nc, lc)

            init = []
            for i in range(n_inter):
                stacks_ref[i, 0] = jnp.int32(0)
                if live_scalars is not None:
                    init.append(live_scalars[i])
                else:
                    live0 = jnp.max(masks[i].astype(jnp.float32)) > 0.0
                    init.append(jnp.where(live0, 1, 0).astype(jnp.int32))
            if stats:
                init += [jnp.int32(0), jnp.int32(0)]
            fin = jax.lax.while_loop(
                wcond, wbody if multi_pop == 1 else wbody_multi, tuple(init)
            )
            if stats:
                return fin[n_inter], fin[n_inter + 1]
            return jnp.int32(0), jnp.int32(0)

        if not octant_split:
            # dead lanes are inert via the -INF best_t plane: no per-op
            # masks; per-half liveness comes from the SMEM flags
            nc, lc = run_pass(
                [None] * n_inter,
                live_scalars=[(fl[i] >> 3) & 1 for i in range(n_inter)],
            )
        else:
            alives = [
                rblk_ref[6, i * S : (i + 1) * S] > 0.0 for i in range(n_inter)
            ]
            # Octant-partitioned traversal for incoherent (bounce) rays:
            # 8 masked passes, each union-ing only same-octant lanes. A
            # block-synchronous walk visits the UNION of its lanes' node
            # needs; for diffuse bounce rays that union approaches the
            # whole tree (measured 1.8 M/s at 139k tris vs 53 M/s
            # coherent). Same-octant lanes share frustum geometry, so
            # each pass's union stays tight; single-octant blocks (the
            # coherent case) skip 7 of the 8 passes via the empty-stack
            # fast path.
            def octx(half):
                lo = half * S
                return (
                    (rblk_ref[3, lo : lo + S] > 0.0).astype(jnp.int32)
                    + 2 * (rblk_ref[4, lo : lo + S] > 0.0).astype(jnp.int32)
                    + 4 * (rblk_ref[5, lo : lo + S] > 0.0).astype(jnp.int32)
                )

            octs = [octx(i) for i in range(n_inter)]

            def opass(k, carry):
                pnc, plc = run_pass([alives[i] & (octs[i] == k)
                                     for i in range(n_inter)])
                return carry[0] + pnc, carry[1] + plc

            nc, lc = jax.lax.fori_loop(
                0, 8, opass, (jnp.int32(0), jnp.int32(0))
            )

        # normalize the winning interpolated normal ONCE per block (the
        # leaf phase stores it unnormalized); miss/dead lanes hold zeros,
        # which stay zeros (0 * rsqrt(1e-20) == 0)
        nx = oblk_ref[2]
        ny = oblk_ref[3]
        nz = oblk_ref[4]
        rlen = jax.lax.rsqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1.0e-20)
        )
        oblk_ref[2] = nx * rlen
        oblk_ref[3] = ny * rlen
        oblk_ref[4] = nz * rlen

        # dead lanes traversed nothing (best_t was -INF); restore their
        # +INF miss sentinel so consumers see the documented contract
        oblk_ref[0] = jnp.where(rblk_ref[6] > 0.0, oblk_ref[0], inf)

        if stats:
            # per-PAIR traversal statistics, broadcast to the pair's rays
            # in two extra output planes (lesson-4 two-step splat)
            ones_col = jnp.ones((n_inter * S, 1), jnp.float32)
            oblk_ref[NOUT] = (onesf * nc.astype(jnp.float32)) * ones_col
            oblk_ref[NOUT + 1] = (onesf * lc.astype(jnp.float32)) * ones_col

        copy_out = pltpu.make_async_copy(
            oblk_ref,
            out_hbm.at[:, pl.ds(pair * n_inter * S, n_inter * S), :],
            out_sem,
        )
        copy_out.start()
        copy_out.wait()

    jax.lax.fori_loop(0, num_pairs, process_pair, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_sub", "octant_split", "multi_pop", "n_inter",
        "ordered",
    ),
)
def wide_shade_first_hit(
    swbvh: ShadedWideBVH,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    alive=None,
    interpret: bool = False,
    block_sub: int = 8,
    octant_split: bool = False,
    multi_pop: int = 1,
    n_inter: int = 2,
    ordered: bool = True,
):
    """Fused nearest-hit + shading data.

    Returns dict(t, id, normal (R,3), mat (R,) i32); miss = (INF, -1,
    zeros, 0). Material constants resolve OUTSIDE from ``mat`` with a
    select chain over the material table (see module docstring). Pads by
    replicating the last ray. ``alive`` (R,) bool marks live paths: blocks
    whose lanes are all dead skip traversal entirely (their outputs are
    miss sentinels).
    ``octant_split=True`` traverses each block in 8 direction-octant masked
    passes (measured slower on real bounce rays — kept as a lineage knob).
    ``multi_pop=K`` expands K stack nodes per vector→scalar sync — the sync
    (~1 us) is the incoherent-traversal currency, so K=4 pays one extract
    for 4 nodes. Needs SMEM stack capacity ``num_nodes`` per half (the DFS
    depth bound no longer applies), so it is only valid for accels whose
    node count fits; the caller falls back to K=1 otherwise.
    ``n_inter`` = independent block walks in flight per program iteration:
    all walks' mask pipelines issue before any walk's scalar extract, so
    their syncs overlap.
    ``ordered=False`` pushes children in a fixed order instead of
    near-first from the block's dominant direction sign — right for
    incoherent blocks whose lanes disagree on sign (the per-node scalar
    order math measured -15% there; ordering pays on coherent blocks).
    """
    if alive is None:
        alive_f = jnp.ones((orig.shape[0],), jnp.float32)
    else:
        alive_f = alive.astype(jnp.float32)
    fo = wide_shade_planes(
        swbvh,
        orig[:, 0], orig[:, 1], orig[:, 2],
        dirn[:, 0], dirn[:, 1], dirn[:, 2],
        alive_f,
        interpret=interpret, block_sub=block_sub,
        octant_split=octant_split, multi_pop=multi_pop, n_inter=n_inter,
        ordered=ordered,
    )
    return {
        "t": fo["t"],
        "id": fo["id"],
        "normal": jnp.stack([fo["nx"], fo["ny"], fo["nz"]], axis=1),
        "mat": fo["mat"],
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_sub", "octant_split", "multi_pop", "n_inter",
        "ordered", "stats",
    ),
)
def wide_shade_planes(
    swbvh: ShadedWideBVH,
    ox: jnp.ndarray, oy: jnp.ndarray, oz: jnp.ndarray,
    dx: jnp.ndarray, dy: jnp.ndarray, dz: jnp.ndarray,
    alive_f: jnp.ndarray,
    interpret: bool = False,
    block_sub: int = 8,
    octant_split: bool = False,
    multi_pop: int = 1,
    n_inter: int = 2,
    ordered: bool = True,
    stats: bool = False,
):
    """SoA entry: flat (R,) ray components in, flat (R,) planes out as
    dict(t, id (i32), nx, ny, nz, mat (i32)). Never builds an (R, 3)
    array — the production wavefront (round 4) keeps ALL per-ray state in
    flat plane-major arrays: minor-dim-3 AoS intermediates at the kernel
    boundary forced materialized mixed-layout relayouts that profiled at
    60+ ms per kernel call per chunk on v5e."""
    n = ox.shape[0]
    block = block_sub * BLOCK_LANE
    pad = (-n) % (n_inter * block)
    comps = [ox, oy, oz, dx, dy, dz]
    if pad:
        # pad lanes replicate the last ray but are DEAD: a trailing
        # all-pad block skips traversal via the alive plane
        comps = [
            jnp.concatenate([c, jnp.broadcast_to(c[-1:], (pad,))])
            for c in comps
        ]
        alive_f = jnp.concatenate([alive_f, jnp.zeros((pad,), jnp.float32)])
    total = n + pad
    rows = total // BLOCK_LANE
    num_pairs = total // (n_inter * block)

    rays = jnp.stack(
        [c.reshape(rows, BLOCK_LANE) for c in comps]
        + [alive_f.reshape(rows, BLOCK_LANE)]
    )

    # accels built before ordered traversal carry no child sort axis;
    # zeros give an arbitrary (still correct) pop order for them
    caxis = swbvh.caxis
    if caxis is None:
        caxis = jnp.zeros((1, swbvh.num_nodes), jnp.int32)

    # Per-half metadata, reduced HERE (cheap XLA) instead of inside the
    # kernel (where liveness and direction-sign reductions each cost a
    # vector→scalar sync per pair — the measured fixed floor of sparse
    # late bounces): bit0-2 = sign of the half's mean live direction per
    # axis (ordered-traversal pop order), bit3 = any-live. Fully dead
    # pairs are skipped before any DMA; their outputs come from the
    # sentinel buffer aliased into the output.
    halves = rows // block_sub
    al_h = alive_f.reshape(halves, block_sub * BLOCK_LANE)
    live_h = (jnp.max(al_h, axis=1) > 0.0).astype(jnp.int32)

    def _sgn(c):
        ch = c.reshape(halves, block_sub * BLOCK_LANE)
        s = jnp.sum(jnp.where(al_h > 0.0, ch, 0.0), axis=1)
        return (s > 0.0).astype(jnp.int32)

    flags = (
        _sgn(comps[3]) | (_sgn(comps[4]) << 1) | (_sgn(comps[5]) << 2)
        | (live_h << 3)
    )

    nout = NOUT + (2 if stats else 0)
    neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
    sentinel = jnp.concatenate(
        [
            jnp.full((1, rows, BLOCK_LANE), _INF, jnp.float32),
            jnp.broadcast_to(neg1, (1, rows, BLOCK_LANE)),
            jnp.zeros((nout - 2, rows, BLOCK_LANE), jnp.float32),
        ]
    )

    # +8 slack: the branchless push writes one garbage slot above the top
    stack_cap = max(STACK_CAP, 8 * (swbvh.max_depth + 2)) + 8
    if multi_pop > 1:
        # batch expansion breaks the DFS depth bound; the hard bound is
        # "every interior node on the stack at once". Cap SMEM use at
        # ~0.5 MiB across the n_inter stacks; larger accels fall back to
        # K=1.
        if swbvh.num_nodes + 16 > 131072 // n_inter:
            multi_pop = 1
        else:
            stack_cap = max(stack_cap, swbvh.num_nodes + 16)
    out = pl.pallas_call(
        functools.partial(
            _wide_shade_kernel,
            leaf_size=swbvh.leaf_size,
            rows_per_leaf=swbvh.rows_per_leaf,
            block_sub=block_sub,
            num_pairs=num_pairs,
            octant_split=octant_split,
            multi_pop=multi_pop,
            n_inter=n_inter,
            ordered=ordered,
            stats=stats,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nout, rows, BLOCK_LANE), jnp.float32),
        input_output_aliases={6: 0},
        scratch_shapes=[
            pltpu.VMEM((7, n_inter * block_sub, BLOCK_LANE), jnp.float32),
            pltpu.VMEM((nout, n_inter * block_sub, BLOCK_LANE), jnp.float32),
            pltpu.SMEM((n_inter, stack_cap), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e has ~128 MiB physical VMEM; the default scoped limit
            # (16 MiB) rejects large resident BVH/triangle tables
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(rays, flags, swbvh.cboxes, swbvh.clinks, caxis, swbvh.tris, sentinel)

    def flat(k):
        return out[k].reshape(-1)[:n]

    res = {
        "t": flat(0),
        "id": jax.lax.bitcast_convert_type(out[1], jnp.int32).reshape(-1)[:n],
        "nx": flat(2),
        "ny": flat(3),
        "nz": flat(4),
        # material ids are small ints stored exactly in f32
        "mat": flat(5).astype(jnp.int32),
    }
    if stats:
        # per-PAIR traversal statistics (node pops / leaf visits),
        # replicated to every ray of the pair
        res["node_visits"] = flat(NOUT).astype(jnp.int32)
        res["leaf_visits"] = flat(NOUT + 1).astype(jnp.int32)
    return res
