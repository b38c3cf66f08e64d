"""Pallas TPU kernel v4: persistent wide-BVH tracer (single program).

The final performance fix in the v1->v4 lineage (see wide_pallas.py): with
one grid program per ray block, the tree tables (SMEM links + VMEM child
boxes/triangles) are RE-COPIED for every program — SMEM fills run at a few
bytes/cycle, costing ~10-100 us per program and dwarfing the actual
traversal (~15 wide-node visits and ~30 leaf tests per coherent block,
~20 ns/leaf of VPU math). This kernel therefore runs as a SINGLE persistent
program: tables land on chip once, and an in-kernel loop walks over all ray
blocks, DMA-ing each block's rays HBM->VMEM and its results back.

Per block: 8-wide frustum walk (scalar SMEM stack, one vectorized interval
test + one mask-pack sync per wide node) collects candidate leaf rows into
an SMEM queue, then a straight-line fori drains the queue with broadcast
Möller–Trumbore. Same conservative-exact semantics and tables as
wide_pallas (accel/wide.py); the jnp binary traversal remains the oracle.
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
STACK_CAP = 192


def _persistent_kernel(
    rays_hbm,                       # ANY (6, rows, 128): ox,oy,oz,dx,dy,dz
    cboxes_ref, clinks_ref, tris_ref,
    out_hbm,                        # ANY (4, rows, 128): t,u,v,id(bitcast f32)
    rblk_ref,                       # VMEM (6, S, 128) scratch
    oblk_ref,                       # VMEM (4, S, 128) scratch
    stack_ref, leafq_ref,           # SMEM scratch
    in_sem, out_sem,
    *, leaf_size: int, rows_per_leaf: int, qcap: int, block_sub: int,
    num_blocks: int,
):
    inf = jnp.float32(_INF)

    def process_block(blk, _):
        copy_in = pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(blk * block_sub, block_sub), :],
            rblk_ref,
            in_sem,
        )
        copy_in.start()
        copy_in.wait()

        ox = rblk_ref[0]
        oy = rblk_ref[1]
        oz = rblk_ref[2]
        dx = rblk_ref[3]
        dy = rblk_ref[4]
        dz = rblk_ref[5]

        olx, ohx = jnp.min(ox), jnp.max(ox)
        oly, ohy = jnp.min(oy), jnp.max(oy)
        olz, ohz = jnp.min(oz), jnp.max(oz)
        dlx, dhx = jnp.min(dx), jnp.max(dx)
        dly, dhy = jnp.min(dy), jnp.max(dy)
        dlz, dhz = jnp.min(dz), jnp.max(dz)

        def setup(dl, dh):
            idl = jnp.where(dl != 0.0, 1.0 / jnp.where(dl != 0.0, dl, 1.0), 0.0)
            idh = jnp.where(dh != 0.0, 1.0 / jnp.where(dh != 0.0, dh, 1.0), 0.0)
            return (dl > 0.0, dl < 0.0, idl, dh > 0.0, dh < 0.0, idh)

        sx, sy, sz = setup(dlx, dhx), setup(dly, dhy), setup(dlz, dhz)

        def axis_bounds(s, ol, oh, bl, bh):
            dl_pos, dl_neg, idl, dh_pos, dh_neg, idh = s
            c1 = bh - ol
            ub1 = jnp.where(
                dl_pos, c1 * idl,
                jnp.where(dl_neg, inf, jnp.where(c1 >= 0.0, inf, -inf)),
            )
            lb1 = jnp.where(dl_neg, c1 * idl, -inf)
            c2 = bl - oh
            lb2 = jnp.where(
                dh_pos, c2 * idh,
                jnp.where(dh_neg, -inf, jnp.where(c2 <= 0.0, -inf, inf)),
            )
            ub2 = jnp.where(dh_neg, c2 * idh, inf)
            return jnp.maximum(lb1, lb2), jnp.minimum(ub1, ub2)

        onesf = ox[0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
        onesi = onesf.astype(jnp.int32)

        def bc(x11, ones):
            return x11 * ones

        # -------- phase 1: wide-BVH frustum walk, queue candidate leaves
        def wcond(state):
            return state[0] > 0

        def wbody(state):
            sp, cnt = state
            sp = sp - 1
            node = stack_ref[sp]
            row = cboxes_ref[pl.ds(node, 1), :]
            lox, hix = axis_bounds(sx, olx, ohx, row[:, 0:8], row[:, 24:32])
            loy, hiy = axis_bounds(sy, oly, ohy, row[:, 8:16], row[:, 32:40])
            loz, hiz = axis_bounds(sz, olz, ohz, row[:, 16:24], row[:, 40:48])
            tlo = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 0.0))
            thi = jnp.minimum(jnp.minimum(hix, hiy), hiz)
            overlap = tlo <= thi
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
                    leafq_ref[cnt_] = -(link + 1)

                sp = sp + is_node.astype(jnp.int32)
                cnt = cnt + is_leaf.astype(jnp.int32)
            return sp, cnt

        stack_ref[0] = jnp.int32(0)
        _, cnt = jax.lax.while_loop(wcond, wbody, (jnp.int32(1), jnp.int32(0)))

        # -------- phase 2: straight-line leaf drain (VPU-bound)
        oblk_ref[0] = jnp.full(ox.shape, _INF, jnp.float32)
        oblk_ref[1] = jnp.zeros(ox.shape, jnp.float32)
        oblk_ref[2] = jnp.zeros(ox.shape, jnp.float32)
        oblk_ref[3] = pltpu.bitcast(
            jnp.full(ox.shape, -1, jnp.int32), jnp.float32
        )

        def drain(i, _):
            leaf_row = leafq_ref[i]
            t_b = oblk_ref[0]
            u_b = oblk_ref[1]
            v_b = oblk_ref[2]
            id_b = pltpu.bitcast(oblk_ref[3], jnp.int32)
            rows = tris_ref[pl.ds(leaf_row, rows_per_leaf), :]
            for kk in range(leaf_size):
                rr = kk // TRIS_PER_ROW
                base = TRI_STRIDE * (kk % TRIS_PER_ROW)
                rec = rows[rr : rr + 1, base : base + TRI_STRIDE]
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
            oblk_ref[0] = t_b
            oblk_ref[1] = u_b
            oblk_ref[2] = v_b
            oblk_ref[3] = pltpu.bitcast(id_b, jnp.float32)
            return 0

        jax.lax.fori_loop(0, cnt, drain, 0)

        copy_out = pltpu.make_async_copy(
            oblk_ref,
            out_hbm.at[:, pl.ds(blk * block_sub, block_sub), :],
            out_sem,
        )
        copy_out.start()
        copy_out.wait()
        return 0

    jax.lax.fori_loop(0, num_blocks, process_block, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_sub")
)
def persistent_first_hit(
    wbvh: WideBVH,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    interpret: bool = False,
    block_sub: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit per ray — persistent wide-BVH kernel.

    Contract identical to bvh_first_hit: (t, u, v, face_id); miss =
    (INF, 0, 0, -1). Pads by replicating the last ray.
    """
    n = orig.shape[0]
    block = block_sub * BLOCK_LANE
    pad = (-n) % block
    if pad:
        orig = jnp.concatenate([orig, jnp.tile(orig[-1:], (pad, 1))], axis=0)
        dirn = jnp.concatenate([dirn, jnp.tile(dirn[-1:], (pad, 1))], axis=0)
    total = orig.shape[0]
    rows = total // BLOCK_LANE
    num_blocks = total // block

    rays = jnp.stack(
        [
            orig[:, 0].reshape(rows, BLOCK_LANE),
            orig[:, 1].reshape(rows, BLOCK_LANE),
            orig[:, 2].reshape(rows, BLOCK_LANE),
            dirn[:, 0].reshape(rows, BLOCK_LANE),
            dirn[:, 1].reshape(rows, BLOCK_LANE),
            dirn[:, 2].reshape(rows, BLOCK_LANE),
        ]
    )  # (6, rows, 128)

    stack_cap = max(STACK_CAP, 8 * (wbvh.max_depth + 2))
    # a leaf can be queued at most once per block walk, so the queue is
    # safely bounded by the total leaf count (SMEM: 4 bytes per leaf)
    qcap = wbvh.tris.shape[0] // wbvh.rows_per_leaf
    out = pl.pallas_call(
        functools.partial(
            _persistent_kernel,
            leaf_size=wbvh.leaf_size,
            rows_per_leaf=wbvh.rows_per_leaf,
            qcap=qcap,
            block_sub=block_sub,
            num_blocks=num_blocks,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # rays stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cboxes
            pl.BlockSpec(memory_space=pltpu.SMEM),   # clinks
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4, rows, BLOCK_LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.VMEM((4, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.SMEM((stack_cap,), jnp.int32),
            pltpu.SMEM((qcap,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rays, wbvh.cboxes, wbvh.clinks, wbvh.tris)

    t = out[0].reshape(-1)[:n]
    u = out[1].reshape(-1)[:n]
    v = out[2].reshape(-1)[:n]
    fid = jax.lax.bitcast_convert_type(out[3], jnp.int32).reshape(-1)[:n]
    return t, u, v, fid
