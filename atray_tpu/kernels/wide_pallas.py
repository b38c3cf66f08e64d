"""Pallas TPU kernel v3: 8-wide BVH frustum walk, one sync per 8 children.

The performance lineage (all measured on v5e, dragon-proxy 20k tris,
coherent 640x360 primaries):

- v1 packet/skip-link (traverse_pallas): ~7 Mrays/s — one vector->scalar
  ``any_hit`` sync per BINARY node visit dominates (~0.3-1.3 us each;
  Mosaic keeps f32 "scalars" in vector registers, so even the scalar
  interval walk of v2 pays the sync).
- v2 scalar frustum walk (frustum_pallas): ~8 Mrays/s — same sync tax,
  just moved.
- v3 (this kernel): the sync is amortized 8x: children of a wide node are
  tested by ONE vectorized interval test in lanes, the 8 overlap bits are
  packed into a single scalar by one reduce, and traversal uses a
  block-level SMEM stack (scalar control). Wide nodes are also ~4x fewer
  than binary nodes.

Table layout (built by accel/wide.py): ``cboxes`` (W, 128) f32 with child
c's field f at lane 8f+c — the kernel statically slices six (1, 8) field
rows; ``clinks`` (8, W) i32 in SMEM; leaf triangle rows shared with the
other kernels (lane stride 16, id bitcast at lane 9).

Conservative frustum semantics are identical to v2: the block's ray bundle
interval bounds cull children; surviving leaf children queue into SMEM and
are intersected by batched vector Möller–Trumbore with a ``tmax`` update
per flush. Results are exact (false-positive culling only) — verified
against the jnp binary traversal.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atray_tpu.accel.wide import WideBVH
from atray_tpu.kernels.traverse_pallas import BLOCK_LANE, TRI_STRIDE, TRIS_PER_ROW

_INF = 3.0e38
_T_MIN = 1.0e-4
STACK_CAP = 96


def _wide_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # ray blocks (S, 128)
    cboxes_ref,                                       # VMEM (W, 128)
    clinks_ref,                                       # SMEM (8, W)
    tris_ref,                                         # VMEM leaf rows
    t_ref, u_ref, v_ref, id_ref,                      # outputs (S, 128)
    stack_ref, leafbuf_ref,                           # SMEM scratch
    *, leaf_size: int, rows_per_leaf: int, qcap: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # ---- once per block: bundle interval bounds
    olx, ohx = jnp.min(ox), jnp.max(ox)
    oly, ohy = jnp.min(oy), jnp.max(oy)
    olz, ohz = jnp.min(oz), jnp.max(oz)
    dlx, dhx = jnp.min(dx), jnp.max(dx)
    dly, dhy = jnp.min(dy), jnp.max(dy)
    dlz, dhz = jnp.min(dz), jnp.max(dz)
    inf = jnp.float32(_INF)

    def setup(dl, dh):
        idl = jnp.where(dl != 0.0, 1.0 / jnp.where(dl != 0.0, dl, 1.0), 0.0)
        idh = jnp.where(dh != 0.0, 1.0 / jnp.where(dh != 0.0, dh, 1.0), 0.0)
        return (dl > 0.0, dl < 0.0, idl, dh > 0.0, dh < 0.0, idh)

    sx, sy, sz = setup(dlx, dhx), setup(dly, dhy), setup(dlz, dhz)

    def axis_bounds(s, ol, oh, bl, bh):
        # bl, bh are (1, 8) rows of the 8 children
        dl_pos, dl_neg, idl, dh_pos, dh_neg, idh = s
        c1 = bh - ol
        ub1 = jnp.where(dl_pos, c1 * idl,
                        jnp.where(dl_neg, inf, jnp.where(c1 >= 0.0, inf, -inf)))
        lb1 = jnp.where(dl_neg, c1 * idl, -inf)
        c2 = bl - oh
        lb2 = jnp.where(dh_pos, c2 * idh,
                        jnp.where(dh_neg, -inf, jnp.where(c2 <= 0.0, -inf, inf)))
        ub2 = jnp.where(dh_neg, c2 * idh, inf)
        return jnp.maximum(lb1, lb2), jnp.minimum(ub1, ub2)

    onesf = ox_ref[0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
    onesi = onesf.astype(jnp.int32)

    def _bc(x11, ones):
        return x11 * ones

    def leaf_tris(leaf_row):
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

    def drain(cnt):
        # straight-line leaf stream: measured ~20 ns/leaf on v5e when not
        # interleaved with traversal control flow (vs ~3 us/leaf when each
        # leaf sits behind its own cond/when inside the walk loop)
        def lbody(i, _):
            leaf_tris(leafbuf_ref[i])
            return 0

        jax.lax.fori_loop(0, cnt, lbody, 0)
        return jnp.int32(0)

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, cnt = state
        sp = sp - 1
        node = stack_ref[sp]
        row = cboxes_ref[pl.ds(node, 1), :]
        blx = row[:, 0:8]
        bly = row[:, 8:16]
        blz = row[:, 16:24]
        bhx = row[:, 24:32]
        bhy = row[:, 32:40]
        bhz = row[:, 40:48]
        lox, hix = axis_bounds(sx, olx, ohx, blx, bhx)
        loy, hiy = axis_bounds(sy, oly, ohy, bly, bhy)
        loz, hiz = axis_bounds(sz, olz, ohz, blz, bhz)
        tlo = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 0.0))
        thi = jnp.minimum(jnp.minimum(hix, hiy), hiz)
        overlap = tlo <= thi
        # array literals would be captured constants (pallas rejects them);
        # build the 2^c weights from an iota instead
        weights = jnp.left_shift(
            jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        )
        mask = jnp.sum(jnp.where(overlap, weights, 0))

        for c in range(8):
            link = clinks_ref[c, node]
            hit_c = (mask // (2 ** c)) % 2 == 1
            is_node = hit_c & (link >= 0)
            is_leaf = hit_c & (link < 0) & (link > -2147483647)

            @pl.when(is_node)
            def _(sp_=sp, link=link):
                stack_ref[sp_] = link

            @pl.when(is_leaf)
            def _(cnt_=cnt, link=link):
                leafbuf_ref[cnt_] = -(link + 1)

            sp = sp + is_node.astype(jnp.int32)
            cnt = cnt + is_leaf.astype(jnp.int32)
        # queue-overflow safety valve: drain mid-walk (rare; QCAP is sized
        # for whole-block candidate sets)
        cnt = jax.lax.cond(cnt >= qcap - 8, drain, lambda c: c, cnt)
        return sp, cnt

    shape = ox.shape
    t_ref[:] = jnp.full(shape, _INF, jnp.float32)
    u_ref[:] = jnp.zeros(shape, jnp.float32)
    v_ref[:] = jnp.zeros(shape, jnp.float32)
    id_ref[:] = jnp.full(shape, -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)
    _, cnt = jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
    drain(cnt)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_sub", "qcap")
)
def wide_first_hit(
    wbvh: WideBVH,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    interpret: bool = False,
    block_sub: int = 8,
    qcap: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit per ray via the 8-wide frustum walk.

    Contract identical to bvh_first_hit: (t, u, v, face_id); miss =
    (INF, 0, 0, -1). Pads by replicating the last ray (tight bundle).
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
    out_shape = [
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.float32),
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.float32),
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.float32),
        jax.ShapeDtypeStruct((rows, BLOCK_LANE), jnp.int32),
    ]
    stack_cap = max(STACK_CAP, 8 * (wbvh.max_depth + 2))
    t, u, v, fid = pl.pallas_call(
        functools.partial(
            _wide_kernel,
            leaf_size=wbvh.leaf_size,
            rows_per_leaf=wbvh.rows_per_leaf,
            qcap=qcap,
        ),
        grid=(grid,),
        in_specs=[ray_spec] * 6
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cboxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # clinks
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((stack_cap,), jnp.int32),
            pltpu.SMEM((qcap,), jnp.int32),
        ],
        interpret=interpret,
    )(*rays, wbvh.cboxes, wbvh.clinks, wbvh.tris)

    t = t.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    fid = fid.reshape(-1)[:n]
    return t, u, v, fid
