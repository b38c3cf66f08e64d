"""Interleaved variant of the exact wide-BVH kernel (2 ray blocks in
flight per loop iteration).

Motivation (measured): wide_exact's incoherent walk spends ~40% of each
node step stalled on the mask OR-reduce's vector->scalar extract. Here two
INDEPENDENT ray blocks are traversed in the same while loop: both blocks'
child-test vector pipelines and OR-reduces are issued back-to-back, then
both scalar phases run — the scalar unit stalls once for block A, by which
time block B's mask is already available. The loop runs until both stacks
empty; a finished block keeps computing masks on a clamped node but its
pushes and leaf phases are gated off (tail waste only).

Everything else (tables, exact per-ray culling, persistent structure,
results) is identical to kernels/wide_exact.py, which remains the simpler
reference implementation.
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


def _wide_exact2_kernel(
    rays_hbm,                        # ANY (6, rows, 128)
    cboxes_ref, clinks_ref, tris_ref,
    out_hbm,                         # ANY (4, rows, 128)
    rblk_ref,                        # VMEM (6, 2S, 128)
    oblk_ref,                        # VMEM (4, 2S, 128)
    stacks_ref,                      # SMEM (2, stack_cap)
    in_sem, out_sem,
    *, leaf_size: int, rows_per_leaf: int, block_sub: int, num_pairs: int,
):
    S = block_sub

    def process_pair(pair, _):
        copy_in = pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(pair * 2 * S, 2 * S), :],
            rblk_ref,
            in_sem,
        )
        copy_in.start()
        copy_in.wait()

        onesf = rblk_ref[0, 0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
        onesi = onesf.astype(jnp.int32)

        def bc(x11, ones):
            return x11 * ones

        inf = jnp.float32(_INF)
        for half in range(2):
            sl = slice(half * S, (half + 1) * S)
            oblk_ref[0, sl] = jnp.full((S, BLOCK_LANE), _INF, jnp.float32)
            oblk_ref[1, sl] = jnp.zeros((S, BLOCK_LANE), jnp.float32)
            oblk_ref[2, sl] = jnp.zeros((S, BLOCK_LANE), jnp.float32)
            oblk_ref[3, sl] = pltpu.bitcast(
                jnp.full((S, BLOCK_LANE), -1, jnp.int32), jnp.float32
            )

        def make_block(half: int):
            """Static per-half closures: ray fields, leaf phase, mask calc."""
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
                    bhit = (t_near <= t_far) & (t_far > 0.0) & (t_near < best_t)
                    rm = rm | jnp.where(bhit, jnp.int32(1 << c), 0)
                # vector-domain OR-reduce (see wide_exact.py)
                m = rm
                s = m.shape[0]
                while s > 1:
                    m = m[: s // 2] | m[s // 2 : 2 * (s // 2)]
                    s //= 2
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    m = m | pltpu.roll(m, shift=sh, axis=1)
                return m  # (1, 128); caller extracts [0, 0]

            def leaf_phase(leaf_row):
                t_b = oblk_ref[0, lo : lo + S]
                u_b = oblk_ref[1, lo : lo + S]
                v_b = oblk_ref[2, lo : lo + S]
                id_b = pltpu.bitcast(oblk_ref[3, lo : lo + S], jnp.int32)
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
                    t_b = jnp.where(hit, tt, t_b)
                    u_b = jnp.where(hit, uu, u_b)
                    v_b = jnp.where(hit, vv, v_b)
                    id_b = jnp.where(hit, fid, id_b)
                oblk_ref[0, lo : lo + S] = t_b
                oblk_ref[1, lo : lo + S] = u_b
                oblk_ref[2, lo : lo + S] = v_b
                oblk_ref[3, lo : lo + S] = pltpu.bitcast(id_b, jnp.float32)

            return raymask, leaf_phase

        rmA, leafA = make_block(0)
        rmB, leafB = make_block(1)

        def wcond(state):
            spA, spB = state
            return (spA > 0) | (spB > 0)

        def scalar_phase(half, live, sp_popped, mask, node, leaf_fn):
            """Pushes + leaf work for one block; returns the new sp."""
            sp = sp_popped
            for c in range(8):
                link = clinks_ref[c, node]
                hit_c = live & ((mask // (2 ** c)) % 2 == 1)
                is_node = hit_c & (link >= 0)
                is_leaf = hit_c & (link < 0) & (link > -2147483647)

                @pl.when(is_node)
                def _(sp_=sp, link=link, half=half):
                    stacks_ref[half, sp_] = link

                @pl.when(is_leaf)
                def _(link=link, leaf_fn=leaf_fn):
                    leaf_fn(-(link + 1))

                sp = sp + is_node.astype(jnp.int32)
            return sp

        def wbody(state):
            spA, spB = state
            liveA = spA > 0
            liveB = spB > 0
            popA = jnp.maximum(spA - 1, 0)
            popB = jnp.maximum(spB - 1, 0)
            nodeA = stacks_ref[0, popA]
            nodeB = stacks_ref[1, popB]
            # both mask pipelines issue before either scalar extract: the
            # scalar unit stalls once, B's result is ready by then
            mA_row = rmA(nodeA)
            mB_row = rmB(nodeB)
            mA = mA_row[0, 0]
            mB = mB_row[0, 0]
            newA = scalar_phase(0, liveA, popA, mA, nodeA, leafA)
            newB = scalar_phase(1, liveB, popB, mB, nodeB, leafB)
            return (jnp.where(liveA, newA, spA),
                    jnp.where(liveB, newB, spB))

        stacks_ref[0, 0] = jnp.int32(0)
        stacks_ref[1, 0] = jnp.int32(0)
        jax.lax.while_loop(wcond, wbody, (jnp.int32(1), jnp.int32(1)))

        copy_out = pltpu.make_async_copy(
            oblk_ref,
            out_hbm.at[:, pl.ds(pair * 2 * S, 2 * S), :],
            out_sem,
        )
        copy_out.start()
        copy_out.wait()
        return 0

    jax.lax.fori_loop(0, num_pairs, process_pair, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub"))
def wide_exact2_first_hit(
    wbvh: WideBVH,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    interpret: bool = False,
    block_sub: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit per ray — interleaved exact wide-BVH kernel.

    Contract identical to bvh_first_hit. Pads by replicating the last ray
    (to a multiple of 2 blocks).
    """
    n = orig.shape[0]
    block = block_sub * BLOCK_LANE
    pad = (-n) % (2 * block)
    if pad:
        orig = jnp.concatenate([orig, jnp.tile(orig[-1:], (pad, 1))], axis=0)
        dirn = jnp.concatenate([dirn, jnp.tile(dirn[-1:], (pad, 1))], axis=0)
    total = orig.shape[0]
    rows = total // BLOCK_LANE
    num_pairs = total // (2 * block)

    rays = jnp.stack(
        [
            orig[:, 0].reshape(rows, BLOCK_LANE),
            orig[:, 1].reshape(rows, BLOCK_LANE),
            orig[:, 2].reshape(rows, BLOCK_LANE),
            dirn[:, 0].reshape(rows, BLOCK_LANE),
            dirn[:, 1].reshape(rows, BLOCK_LANE),
            dirn[:, 2].reshape(rows, BLOCK_LANE),
        ]
    )

    stack_cap = max(STACK_CAP, 8 * (wbvh.max_depth + 2))
    out = pl.pallas_call(
        functools.partial(
            _wide_exact2_kernel,
            leaf_size=wbvh.leaf_size,
            rows_per_leaf=wbvh.rows_per_leaf,
            block_sub=block_sub,
            num_pairs=num_pairs,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4, rows, BLOCK_LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6, 2 * block_sub, BLOCK_LANE), jnp.float32),
            pltpu.VMEM((4, 2 * block_sub, BLOCK_LANE), jnp.float32),
            pltpu.SMEM((2, stack_cap), jnp.int32),
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
    )(rays, wbvh.cboxes, wbvh.clinks, wbvh.tris)

    t = out[0].reshape(-1)[:n]
    u = out[1].reshape(-1)[:n]
    v = out[2].reshape(-1)[:n]
    fid = jax.lax.bitcast_convert_type(out[3], jnp.int32).reshape(-1)[:n]
    return t, u, v, fid
