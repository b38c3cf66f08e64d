"""Pallas TPU kernel: packet (block-synchronous) BVH traversal + intersection.

THE hot kernel (SURVEY.md §7 hard part #1). Design rationale:

The reference traverses its octree per ray with explicit stacks
(kd_tree.cpp:337-465) — fine on a scalar CPU, hostile to an 8x128-lane VPU:
per-lane stacks and per-lane node pointers need per-lane gathers, which the
TPU memory system does not do. Instead each Pallas program owns a BLOCK of
rays (SoA (S,128) f32 tiles per field) that traverses the skip-link BVH
**in lockstep** — classic coherent packet tracing:

- ONE scalar node cursor per block;
- the block descends iff ANY live ray hits the node box (vector reduce);
- subtree pruning: enter only if some ray has box-entry < its best t;
- at a leaf, ``leaf_size`` triangles are unrolled, each broadcast against
  the whole block (Möller–Trumbore, elementwise VPU); degenerate pad
  triangles (p0 at 1e30, zero edges) can never hit.

Memory placement is the performance story (measured on v5e):

- **node boxes + links live in SMEM** ((6,K) f32 and (2,K) i32): the
  traversal inner loop is scalar-load -> scalar-broadcast -> vector slab
  test. SMEM scalar loads are a few cycles and scalar operands broadcast
  into VPU ops for free. The earlier VMEM design needed a dynamic-sublane
  row load + pltpu.roll + vector->scalar extracts per node (the lane dim
  cannot be dynamically indexed) and ran ~4x slower.
- **leaf triangles live in VMEM** ((rows_per_leaf*num_leaves, 128) f32,
  tri k of a leaf at lane stride 16: [p0.xyz, e1.xyz, e2.xyz,
  bitcast(orig_id)]): a leaf is ONE static-size dynamic-sublane load; each
  field is a static (1,1) slice splatted to (1,128) via multiply-by-ones
  (Mosaic cannot broadcast sublanes+lanes in one op, and folds away both a
  constant-ones multiply and any int identity — hence the data-dependent
  f32 ones row).

Packet traversal is efficient when rays in a block are coherent: the
renderer orders primary rays in film order (samples of one pixel share a
block) and re-sorts bounce rays (render/compaction). The same kernel runs
under ``interpret=True`` on CPU for tests; the jnp skip-link traversal
(accel/traverse.py) is its independent oracle.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atray_tpu.accel.bvh import BVH

BLOCK_LANE = 128
TRI_STRIDE = 16        # lanes per triangle record in the leaf row
TRIS_PER_ROW = BLOCK_LANE // TRI_STRIDE   # 8

# plain python floats: jnp constants at module scope would be captured as
# tracer constants by the kernel, which pallas_call rejects
_INF = 3.0e38
_T_MIN = 1.0e-4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TreePack:
    """BVH repacked for the packet kernel (SMEM tables + VMEM leaf rows)."""

    nodebox: jnp.ndarray   # f32 (6, K): minx,miny,minz,maxx,maxy,maxz
    ctrl: jnp.ndarray      # i32 (2, K): miss link, leaf_row or -1
    tris: jnp.ndarray      # f32 (rows_per_leaf * num_leaves, 128)
    leaf_size: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def rows_per_leaf(self) -> int:
        return max(1, self.leaf_size // TRIS_PER_ROW)


def pack_bvh(bvh: BVH) -> TreePack:
    """Repack a flattened BVH for the packet kernel.

    leaf_size must be <= 8 or a multiple of 8 (whole extra 128-lane rows).
    """
    ls = bvh.leaf_size
    if ls > TRIS_PER_ROW and ls % TRIS_PER_ROW != 0:
        raise ValueError(f"leaf_size {ls} must be <=8 or a multiple of 8")
    k = int(bvh.node_min.shape[0])
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    nodebox = np.concatenate([nmin.T, nmax.T], axis=0).astype(np.float32)  # (6, K)

    rows_per_leaf = max(1, ls // TRIS_PER_ROW)
    leaf_start = np.asarray(bvh.leaf_start)
    leaf_row = np.where(
        leaf_start >= 0, (leaf_start // ls) * rows_per_leaf, -1
    ).astype(np.int32)
    ctrl = np.stack(
        [np.asarray(bvh.node_miss), leaf_row], axis=0
    ).astype(np.int32)  # (2, K)

    tp0 = np.asarray(bvh.tri_p0)
    te1 = np.asarray(bvh.tri_e1)
    te2 = np.asarray(bvh.tri_e2)
    tid = np.asarray(bvh.tri_orig_id)
    slots = tp0.shape[0]                      # num_leaves * leaf_size
    num_leaves = max(1, slots // ls)
    tris = np.zeros((num_leaves * rows_per_leaf, BLOCK_LANE), np.float32)
    # pad slots must never hit: p0 far away, zero-area edges
    tris[:, 0::TRI_STRIDE] = 1.0e30
    tris[:, 1::TRI_STRIDE] = 1.0e30
    tris[:, 2::TRI_STRIDE] = 1.0e30
    flat_tris = tris.reshape(-1, TRI_STRIDE)  # one record per row
    s = np.arange(slots)
    rec = (s // ls) * (rows_per_leaf * TRIS_PER_ROW) + (s % ls)
    flat_tris[rec, 0:3] = tp0
    flat_tris[rec, 3:6] = te1
    flat_tris[rec, 6:9] = te2
    flat_tris[rec, 9] = tid.view(np.float32)  # bitcast int32 -> f32
    return TreePack(
        nodebox=jnp.asarray(nodebox),
        ctrl=jnp.asarray(ctrl),
        tris=jnp.asarray(tris),
        leaf_size=ls,
        num_nodes=k,
    )


def _bc(x11, ones):
    """(1,1) -> (1,128) lane splat via multiply-by-(data-dependent)-ones;
    see module docstring for why a plain broadcast_to cannot be used."""
    return x11 * ones


def _traverse_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # ray blocks (S, 128)
    nodebox_ref, ctrl_ref,                            # SMEM scalar tables
    tris_ref,                                         # VMEM leaf rows
    t_ref, u_ref, v_ref, id_ref,                      # outputs (S, 128)
    *, leaf_size: int, rows_per_leaf: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    big = jnp.float32(1.0e30)
    idx = jnp.where(dx == 0.0, big, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
    idy = jnp.where(dy == 0.0, big, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
    idz = jnp.where(dz == 0.0, big, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

    # data-dependent ones rows (Mosaic folds constant/int identities; f32
    # x*0.0 is not foldable, so these survive as real (1,128) values)
    # NB: must come from a NaN-free source — tris rows contain bitcast int
    # ids (pad id -1 == 0xFFFFFFFF == NaN, and NaN*0 = NaN would poison
    # that lane of every block); ray origins are always finite.
    onesf = ox_ref[0:1, :] * jnp.float32(0.0) + jnp.float32(1.0)
    onesi = onesf.astype(jnp.int32)

    def leaf_phase(leaf_row, best):
        t_b, u_b, v_b, id_b = best
        rows = tris_ref[pl.ds(leaf_row, rows_per_leaf), :]  # (rpl, 128)
        for kk in range(leaf_size):
            rr = kk // TRIS_PER_ROW
            base = TRI_STRIDE * (kk % TRIS_PER_ROW)
            rec = rows[rr : rr + 1, base : base + TRI_STRIDE]  # (1, 16)
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
            # Möller–Trumbore, backface-culled: one broadcast tri vs block
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
        return t_b, u_b, v_b, id_b

    def cond(state):
        node, _ = state
        return node >= 0

    def body(state):
        node, best = state
        # SMEM scalar loads broadcast into the vector slab test for free
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
        bhit = (t_near <= t_far) & (t_far > 0.0) & (t_near < best[0])
        any_hit = jnp.any(bhit)              # the one vector->scalar transfer

        miss = ctrl_ref[0, node]
        leaf_row = ctrl_ref[1, node]
        is_leaf = leaf_row >= 0

        best = jax.lax.cond(
            any_hit & is_leaf,
            lambda b: leaf_phase(leaf_row, b),
            lambda b: b,
            best,
        )
        nxt = jnp.where(any_hit & (~is_leaf), node + 1, miss)
        return nxt, best

    shape = ox.shape
    init_best = (
        jnp.full(shape, _INF, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
    )
    _, best = jax.lax.while_loop(cond, body, (jnp.int32(0), init_best))
    t_ref[:] = best[0]
    u_ref[:] = best[1]
    v_ref[:] = best[2]
    id_ref[:] = best[3]


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub"))
def pallas_first_hit(
    pack: TreePack,
    orig: jnp.ndarray,   # (R, 3)
    dirn: jnp.ndarray,   # (R, 3)
    interpret: bool = False,
    block_sub: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit per ray — Pallas packet traversal.

    Same contract as accel.traverse.bvh_first_hit: (t, u, v, face_id),
    miss = (INF, 0, 0, -1). ``block_sub`` sublanes * 128 lanes rays per
    program (bigger blocks amortize scalar control, cost coherence).
    """
    n = orig.shape[0]
    block = block_sub * BLOCK_LANE
    pad = (-n) % block
    if pad:
        orig = jnp.concatenate(
            [orig, jnp.full((pad, 3), 1.0e8, orig.dtype)], axis=0
        )
        dirn = jnp.concatenate(
            [dirn, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dirn.dtype), (pad, 1))],
            axis=0,
        )
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
            _traverse_kernel,
            leaf_size=pack.leaf_size,
            rows_per_leaf=pack.rows_per_leaf,
        ),
        grid=(grid,),
        in_specs=[ray_spec] * 6 + [smem_spec, smem_spec, vmem_spec],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*rays, pack.nodebox, pack.ctrl, pack.tris)

    t = t.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    fid = fid.reshape(-1)[:n]
    return t, u, v, fid
