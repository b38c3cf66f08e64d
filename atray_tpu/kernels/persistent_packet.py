"""Persistent packet-traversal kernel: exact per-ray culling, single program.

The incoherent-ray workhorse. The gridded packet kernel
(traverse_pallas.pallas_first_hit) re-copies its SMEM node tables for every
grid program (~150-250 us per program for a Dragon-scale tree — SMEM fills
run at a few bytes/cycle), which dwarfs the actual walk. This variant uses
the persistent pattern of persistent_pallas.py: one program, tables on chip
once, an in-kernel loop DMA-ing ray blocks in and results out.

The walk itself is the binary skip-link packet traversal: every node visit
slab-tests ALL rays in the block (vector), descends iff any live ray hits
with ``t_entry < best_t`` (exact per-ray pruning — this is what makes it
win on incoherent rays, where the frustum bundle test of the wide kernel
degenerates), and leaf visits run broadcast Möller–Trumbore inline. Blocks
of parked dead rays (origins at 1e7 after compaction) reject at the root
in one step.

Tables are the TreePack layout (SMEM (6,K)/(2,K) + VMEM leaf rows).
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
)

_INF = 3.0e38
_T_MIN = 1.0e-4


def _ppacket_kernel(
    rays_hbm,                        # ANY (6, rows, 128)
    nodebox_ref, ctrl_ref, tris_ref,
    out_hbm,                         # ANY (4, rows, 128)
    rblk_ref, oblk_ref,              # VMEM scratch
    in_sem, out_sem,
    *, leaf_size: int, rows_per_leaf: int, block_sub: int, num_blocks: int,
):
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

        big = jnp.float32(1.0e30)
        idx = jnp.where(dx == 0.0, big, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
        idy = jnp.where(dy == 0.0, big, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
        idz = jnp.where(dz == 0.0, big, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

        onesf = ox[0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
        onesi = onesf.astype(jnp.int32)

        def bc(x11, ones):
            return x11 * ones

        oblk_ref[0] = jnp.full(ox.shape, _INF, jnp.float32)
        oblk_ref[1] = jnp.zeros(ox.shape, jnp.float32)
        oblk_ref[2] = jnp.zeros(ox.shape, jnp.float32)
        oblk_ref[3] = pltpu.bitcast(
            jnp.full(ox.shape, -1, jnp.int32), jnp.float32
        )

        def leaf_phase(leaf_row):
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

        def cond(node):
            return node >= 0

        def body(node):
            bminx = nodebox_ref[0, node]
            bminy = nodebox_ref[1, node]
            bminz = nodebox_ref[2, node]
            bmaxx = nodebox_ref[3, node]
            bmaxy = nodebox_ref[4, node]
            bmaxz = nodebox_ref[5, node]
            tx0 = (bminx - ox) * idx
            tx1 = (bmaxx - ox) * idx
            ty0 = (bminy - oy) * idy
            ty1 = (bmaxy - oy) * idy
            tz0 = (bminz - oz) * idz
            tz1 = (bmaxz - oz) * idz
            t_near = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            t_far = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            bhit = (t_near <= t_far) & (t_far > 0.0) & (t_near < oblk_ref[0])
            any_hit = jnp.any(bhit)
            miss = ctrl_ref[0, node]
            leaf_row = ctrl_ref[1, node]
            is_leaf = leaf_row >= 0

            @pl.when(any_hit & is_leaf)
            def _():
                leaf_phase(leaf_row)

            return jnp.where(any_hit & (~is_leaf), node + 1, miss)

        jax.lax.while_loop(cond, body, jnp.int32(0))

        copy_out = pltpu.make_async_copy(
            oblk_ref,
            out_hbm.at[:, pl.ds(blk * block_sub, block_sub), :],
            out_sem,
        )
        copy_out.start()
        copy_out.wait()
        return 0

    jax.lax.fori_loop(0, num_blocks, process_block, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub"))
def ppacket_first_hit(
    pack: TreePack,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    interpret: bool = False,
    block_sub: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit per ray — persistent packet kernel.

    Contract identical to bvh_first_hit. Pads by replicating the last ray.
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
    )

    out = pl.pallas_call(
        functools.partial(
            _ppacket_kernel,
            leaf_size=pack.leaf_size,
            rows_per_leaf=pack.rows_per_leaf,
            block_sub=block_sub,
            num_blocks=num_blocks,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nodebox
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ctrl
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((4, rows, BLOCK_LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6, block_sub, BLOCK_LANE), jnp.float32),
            pltpu.VMEM((4, block_sub, BLOCK_LANE), jnp.float32),
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
    )(rays, pack.nodebox, pack.ctrl, pack.tris)

    t = out[0].reshape(-1)[:n]
    u = out[1].reshape(-1)[:n]
    v = out[2].reshape(-1)[:n]
    fid = jax.lax.bitcast_convert_type(out[3], jnp.int32).reshape(-1)[:n]
    return t, u, v, fid
