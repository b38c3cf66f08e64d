"""Pallas TPU kernel v2: scalar frustum walk + batched vector leaf tests.

Why this exists (measured on v5e, see kernels/traverse_pallas.py for v1):
the packet kernel's per-node ``any_hit`` reduce forces a vector->scalar
sync every step (~300 ns — the scalar unit, which runs ahead of the VPU,
must stall on the vector result). A walk whose control flow is computed
entirely on the SCALAR unit runs at ~25-40 ns/step. So v2 splits traversal
into:

1. **Scalar frustum walk** (no vector ops at all): the block's ray bundle
   is summarized once by interval bounds — origin box [ol, oh] and
   direction box [dl, dh] per axis (12 vector reduces, once per block).
   Each skip-link step performs a conservative interval slab test of the
   bundle against the node AABB in ~60 scalar ops: the reachable set at
   parameter t is [ol + t*dl, oh + t*dh] (t >= 0), and each of the four
   linear constraints contributes a t-bound selected by the precomputed
   sign of dl/dh. Leaf nodes that overlap are appended to an SMEM queue.

2. **Batched vector leaf phase**: every BATCH queued leaves (or at walk
   end), a flush intersects their triangles against the whole ray block —
   pure VPU Möller–Trumbore, one ``max(best_t)`` reduce per flush (to
   tighten the walk's conservative far-plane ``tmax``), amortizing the
   expensive sync 1/BATCH per leaf.

The test is conservative (false positives only): every leaf any ray could
hit is visited, so results are exact — verified against the jnp skip-link
traversal. Efficiency depends on bundle coherence: the renderer orders
primary rays in film tiles and sorts bounce rays.

Table layout is shared with v1 via ``pack_bvh`` (SMEM nodebox/ctrl, VMEM
leaf rows at lane stride 16, tri id bitcast into the f32 row).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atray_tpu.kernels.traverse_pallas import (
    BLOCK_LANE,
    TRI_STRIDE,
    TRIS_PER_ROW,
    TreePack,
    pack_bvh,
)

_INF = 3.0e38
_T_MIN = 1.0e-4
LEAF_BATCH = 8  # default; tunable per call via leaf_batch


def _frustum_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # ray blocks (S, 128)
    nodebox_ref, ctrl_ref,                            # SMEM scalar tables
    tris_ref,                                         # VMEM leaf rows
    t_ref, u_ref, v_ref, id_ref,                      # outputs (S, 128)
    leafbuf_ref, tlobuf_ref,                          # SMEM scratch queues
    *, leaf_size: int, rows_per_leaf: int, leaf_batch: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # ---- once per block: bundle interval bounds (12 vector->scalar syncs)
    olx, ohx = jnp.min(ox), jnp.max(ox)
    oly, ohy = jnp.min(oy), jnp.max(oy)
    olz, ohz = jnp.min(oz), jnp.max(oz)
    dlx, dhx = jnp.min(dx), jnp.max(dx)
    dly, dhy = jnp.min(dy), jnp.max(dy)
    dlz, dhz = jnp.min(dz), jnp.max(dz)

    inf = jnp.float32(_INF)

    def axis_setup(dl, dh):
        # precompute per-block selectors + safe reciprocals for the four
        # per-node constraint bounds of this axis
        idl = jnp.where(dl != 0.0, 1.0 / jnp.where(dl != 0.0, dl, 1.0), 0.0)
        idh = jnp.where(dh != 0.0, 1.0 / jnp.where(dh != 0.0, dh, 1.0), 0.0)
        return (dl > 0.0, dl < 0.0, idl, dh > 0.0, dh < 0.0, idh)

    ax = axis_setup(dlx, dhx)
    ay = axis_setup(dly, dhy)
    az = axis_setup(dlz, dhz)

    def axis_t_bounds(setup, ol, oh, bl, bh):
        dl_pos, dl_neg, idl, dh_pos, dh_neg, idh = setup
        # constraint 1: ol + t*dl <= bh
        c1 = bh - ol
        ub1 = jnp.where(dl_pos, c1 * idl,
                        jnp.where(dl_neg, inf, jnp.where(c1 >= 0.0, inf, -inf)))
        lb1 = jnp.where(dl_neg, c1 * idl, -inf)
        # constraint 2: oh + t*dh >= bl
        c2 = bl - oh
        lb2 = jnp.where(dh_pos, c2 * idh,
                        jnp.where(dh_neg, -inf, jnp.where(c2 <= 0.0, -inf, inf)))
        ub2 = jnp.where(dh_neg, c2 * idh, inf)
        return jnp.maximum(lb1, lb2), jnp.minimum(ub1, ub2)

    # vectorized over the ray block: inverse directions for the leaf phase
    big = jnp.float32(1.0e30)
    # (leaf MT needs no inv dir; slab not used vectorized here)

    # NB: must come from a NaN-free source — tris rows contain bitcast int
    # ids (pad id -1 == 0xFFFFFFFF == NaN, and NaN*0 = NaN would poison
    # that lane of every block); ray origins are always finite.
    onesf = ox_ref[0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
    onesi = onesf.astype(jnp.int32)

    def _bc(x11, ones):
        return x11 * ones

    def leaf_tris(leaf_row):
        # reads/writes the output refs in place: keeping the running best as
        # while/cond carried vector state forces register spills around every
        # control-flow boundary; refs keep the loop state scalar-only
        t_b = t_ref[:]
        u_b = u_ref[:]
        v_b = v_ref[:]
        id_b = id_ref[:]
        rows = tris_ref[pl.ds(leaf_row, rows_per_leaf), :]
        for kk in range(leaf_size):
            rr = kk // TRIS_PER_ROW
            base = TRI_STRIDE * (kk % TRIS_PER_ROW)
            rec = rows[rr : rr + 1, base : base + TRI_STRIDE]
            p0x = _bc(rec[:, 0:1], onesf)
            p0y = _bc(rec[:, 1:2], onesf)
            p0z = _bc(rec[:, 2:3], onesf)
            e1x = _bc(rec[:, 3:4], onesf)
            e1y = _bc(rec[:, 4:5], onesf)
            e1z = _bc(rec[:, 5:6], onesf)
            e2x = _bc(rec[:, 6:7], onesf)
            e2y = _bc(rec[:, 7:8], onesf)
            e2z = _bc(rec[:, 8:9], onesf)
            fid = _bc(pltpu.bitcast(rec[:, 9:10], jnp.int32), onesi)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            valid = det > jnp.float32(1.0e-12)
            inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
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
            t_b = jnp.where(hit, tt, t_b)
            u_b = jnp.where(hit, uu, u_b)
            v_b = jnp.where(hit, vv, v_b)
            id_b = jnp.where(hit, fid, id_b)
        t_ref[:] = t_b
        u_ref[:] = u_b
        v_ref[:] = v_b
        id_ref[:] = id_b

    def flush(cnt, tmax):
        def lbody(i, _):
            # re-check against the current (possibly much tighter) tmax:
            # the entry bound was computed when the leaf was queued
            @pl.when(tlobuf_ref[i] <= tmax)
            def _():
                leaf_tris(leafbuf_ref[i])

            return 0

        jax.lax.fori_loop(0, cnt, lbody, 0)
        tmax = jnp.max(t_ref[:])    # one sync per flush, tightens the walk
        return jnp.int32(0), tmax

    def cond(state):
        return state[0] >= 0

    def body(state):
        node, cnt, tmax = state
        blx = nodebox_ref[0, node]
        bly = nodebox_ref[1, node]
        blz = nodebox_ref[2, node]
        bhx = nodebox_ref[3, node]
        bhy = nodebox_ref[4, node]
        bhz = nodebox_ref[5, node]

        lox, hix = axis_t_bounds(ax, olx, ohx, blx, bhx)
        loy, hiy = axis_t_bounds(ay, oly, ohy, bly, bhy)
        loz, hiz = axis_t_bounds(az, olz, ohz, blz, bhz)
        tlo = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 0.0))
        thi = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, tmax))
        overlap = tlo <= thi

        miss = ctrl_ref[0, node]
        leaf_row = ctrl_ref[1, node]
        is_leaf = leaf_row >= 0
        push = overlap & is_leaf

        @pl.when(push)
        def _():
            leafbuf_ref[cnt] = leaf_row
            tlobuf_ref[cnt] = tlo

        cnt = cnt + push.astype(jnp.int32)
        nxt = jnp.where(overlap & (~is_leaf), node + 1, miss)
        do_flush = (cnt >= leaf_batch) | ((nxt < 0) & (cnt > 0))
        cnt, tmax = jax.lax.cond(
            do_flush, flush, lambda c, tm: (c, tm), cnt, tmax
        )
        return nxt, cnt, tmax

    shape = ox.shape
    t_ref[:] = jnp.full(shape, _INF, jnp.float32)
    u_ref[:] = jnp.zeros(shape, jnp.float32)
    v_ref[:] = jnp.zeros(shape, jnp.float32)
    id_ref[:] = jnp.full(shape, -1, jnp.int32)
    init = (jnp.int32(0), jnp.int32(0), jnp.float32(_INF))
    jax.lax.while_loop(cond, body, init)


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub", "leaf_batch"))
def frustum_first_hit(
    pack: TreePack,
    orig: jnp.ndarray,   # (R, 3)
    dirn: jnp.ndarray,   # (R, 3)
    interpret: bool = False,
    block_sub: int = 8,
    leaf_batch: int = LEAF_BATCH,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit per ray — scalar-frustum-walk Pallas kernel.

    Same contract as bvh_first_hit/pallas_first_hit. Rays are padded to a
    block multiple by REPLICATING the last ray (arbitrary pad values would
    inflate the bundle's interval bounds and destroy the walk's culling).
    """
    n = orig.shape[0]
    block = block_sub * BLOCK_LANE
    pad = (-n) % block
    if pad:
        orig = jnp.concatenate([orig, jnp.tile(orig[-1:], (pad, 1))], axis=0)
        dirn = jnp.concatenate([dirn, jnp.tile(dirn[-1:], (pad, 1))], axis=0)
    total = orig.shape[0]
    rows = total // BLOCK_LANE
    grid = total // block

    def field(a, i):
        return a[:, i].reshape(rows, BLOCK_LANE)

    rays = [field(orig, 0), field(orig, 1), field(orig, 2),
            field(dirn, 0), field(dirn, 1), field(dirn, 2)]

    ray_spec = pl.BlockSpec(
        (block_sub, BLOCK_LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.float32),
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.float32),
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.float32),
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.int32),
    ]
    t, u, v, fid = pl.pallas_call(
        functools.partial(
            _frustum_kernel,
            leaf_size=pack.leaf_size,
            rows_per_leaf=pack.rows_per_leaf,
            leaf_batch=leaf_batch,
        ),
        grid=(grid,),
        in_specs=[ray_spec] * 6 + [smem_spec, smem_spec, vmem_spec],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((leaf_batch,), jnp.int32),
                        pltpu.SMEM((leaf_batch,), jnp.float32)],
        interpret=interpret,
    )(*rays, pack.nodebox, pack.ctrl, pack.tris)

    t = t.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    fid = fid.reshape(-1)[:n]
    return t, u, v, fid
