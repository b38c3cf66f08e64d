"""Shaded wide-BVH: leaf records embed shading data so the traversal kernel
returns everything shading needs — zero per-ray gathers in the forward pass.

Motivation (measured, v5e): XLA row gathers run at ~250 M elements/s; the
per-bounce resolve/material gathers (~30 floats/ray) cost ~120 ns per ray
lane and dominated the frame (~0.6 s of a 0.77 s dragon frame). The fused
kernel (kernels/wide_shade.py) instead reads each candidate triangle's
record ONCE as broadcast lanes during the leaf test it already performs,
interpolates the shading normal in-kernel, and outputs per-ray
(t, id, normal, material id); material constants resolve outside the
kernel with a select chain over the tiny material table. The records
still bake emission/albedo/scatter (columns 20-26) for layout stability,
but the production kernel no longer reads them (round 4: the per-candidate
material broadcasts + selects were ~20% of the leaf phase).

Leaf record layout, lane stride 32 (4 records per 128-lane row):
  0-2  p0     3-5  e1     6-8  e2     9  face id (bitcast f32)
  10-12 n0    13-15 n1    16-18 n2        (flat normal in all three when
                                           the face has no smooth normals)
  19   material id (exact f32)
  20-22 emission   23-25 albedo   26 scatter   27-31 pad

Coupling caveat: the records BAKE vertex normals and material constants at
build time. Forward rendering uses this accel; parameter optimization
(inverse rendering) must use the unshaded accel + gather path, or rebuild
per step. Gradients through the fused call are exact anyway: its custom
VJP replays the differentiable resolve from the face id (wavefront.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from atray_tpu.accel.bvh import BVH, build_bvh
from atray_tpu.accel.wide import build_wide_bvh
from atray_tpu.config import KDTreeConfig

STRIDE32 = 32
RECS_PER_ROW = 128 // STRIDE32   # 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShadedWideBVH:
    """Wide-BVH tables with shaded stride-32 leaf records.

    ``tboxes``/``num_treelets``/``leaves_per_treelet`` describe the
    TREELET view used by the round-5 pair-binned traversal
    (kernels/treelet_pairs.py): consecutive windows of
    ``leaves_per_treelet`` leaves form dense, spatially coherent record
    ranges; ``tboxes`` packs 8 treelet AABBs per 128-lane row in the
    same [8*lo_x | 8*lo_y | 8*lo_z | 8*hi_x | 8*hi_y | 8*hi_z] layout
    as ``cboxes`` so the Phase-A kernel reuses the 8-wide slab pattern.
    """

    cboxes: jnp.ndarray   # f32 (W, 128)
    clinks: jnp.ndarray   # i32 (8, W)
    tris: jnp.ndarray     # f32 (rows_per_leaf * num_leaves, 128), stride 32
    leaf_size: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    max_depth: int = dataclasses.field(metadata=dict(static=True))
    # child sort axis per node (1, W) i32 — see accel.wide.WideBVH.caxis
    caxis: jnp.ndarray = None
    # treelet view (round 5): (T_pad/8, 128) packed AABBs; 0 when absent
    tboxes: jnp.ndarray = None
    num_treelets: int = dataclasses.field(
        default=0, metadata=dict(static=True))
    leaves_per_treelet: int = dataclasses.field(
        default=0, metadata=dict(static=True))
    # vertex snapshot at build time, for refit_shaded's conservative
    # node-box expansion (None = built without refit support)
    build_vertices: jnp.ndarray = None

    @property
    def rows_per_leaf(self) -> int:
        return max(1, self.leaf_size // RECS_PER_ROW)

    @property
    def rows_per_treelet(self) -> int:
        return self.rows_per_leaf * self.leaves_per_treelet


def _treelet_boxes_np(tris: np.ndarray, leaf_size: int,
                      leaves_per_treelet: int):
    """Pack per-treelet AABBs 8-per-row from the shaded record array.

    Returns (tboxes (ceil(T/8), 128) f32, num_treelets). Pad treelets
    (and pad records inside real treelets) get inverted boxes that no
    slab test can hit.
    """
    recs = tris.reshape(-1, STRIDE32)
    p0 = recs[:, 0:3].astype(np.float64)
    e1 = recs[:, 3:6].astype(np.float64)
    e2 = recs[:, 6:9].astype(np.float64)
    real = recs[:, 0] < 1.0e29
    v1, v2 = p0 + e1, p0 + e2
    lo = np.minimum(np.minimum(p0, v1), v2)
    hi = np.maximum(np.maximum(p0, v1), v2)
    lo[~real] = 1.0e30
    hi[~real] = -1.0e30
    tpt = leaves_per_treelet * leaf_size
    T = -(-recs.shape[0] // tpt)
    pad = T * tpt - recs.shape[0]
    if pad:
        lo = np.concatenate([lo, np.full((pad, 3), 1.0e30)])
        hi = np.concatenate([hi, np.full((pad, 3), -1.0e30)])
    tlo64 = lo.reshape(T, tpt, 3).min(axis=1)
    thi64 = hi.reshape(T, tpt, 3).max(axis=1)
    # round OUTWARD on the f64 -> f32 cast: a to-nearest cast can shrink
    # the box past a triangle's true extent and a grazing ray would miss
    # a treelet that contains its hit (conservative boxes only ever
    # admit an extra candidate)
    tlo = tlo64.astype(np.float32)
    tlo = np.where(tlo.astype(np.float64) > tlo64,
                   np.nextafter(tlo, np.float32(-np.inf)), tlo)
    thi = thi64.astype(np.float32)
    thi = np.where(thi.astype(np.float64) < thi64,
                   np.nextafter(thi, np.float32(np.inf)), thi)
    # un-hittable marker for empty treelets and row-pad lanes: an
    # INVERTED box does NOT fail the slab test (per-axis min/max
    # neutralize the inversion into an everything-box — measured the
    # hard way: every ray claimed every pad treelet at entry distance
    # 0). NaN planes make every comparison false.
    empty = (tlo64 > thi64).any(axis=1)
    tlo[empty] = np.nan
    thi[empty] = np.nan
    rows = -(-T // 8)
    tb = np.zeros((rows, 128), np.float32)
    full_lo = np.concatenate(
        [tlo, np.full((rows * 8 - T, 3), np.nan, np.float32)])
    full_hi = np.concatenate(
        [thi, np.full((rows * 8 - T, 3), np.nan, np.float32)])
    for ax in range(3):
        tb[:, 8 * ax: 8 * ax + 8] = full_lo[:, ax].reshape(rows, 8)
        tb[:, 24 + 8 * ax: 32 + 8 * ax] = full_hi[:, ax].reshape(rows, 8)
    return tb, T


def _face_shading_np(scene):
    """(T, 10+..) host arrays: per-face n0,n1,n2 (flat fallback), mat id,
    and baked material constants."""
    v = np.asarray(scene.mesh.vertices, np.float64)
    f = np.asarray(scene.mesh.faces)
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    flat = np.cross(e1, e2)
    flat /= np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-20)
    nidx = np.asarray(scene.mesh.face_normal_idx)
    has = (nidx[:, 0] >= 0)[:, None]
    ncl = np.clip(nidx, 0, np.asarray(scene.mesh.normals).shape[0] - 1)
    norms = np.asarray(scene.mesh.normals, np.float64)
    n0 = np.where(has, norms[ncl[:, 0]], flat)
    n1 = np.where(has, norms[ncl[:, 1]], flat)
    n2 = np.where(has, norms[ncl[:, 2]], flat)
    mat = np.asarray(scene.mesh.material_id)
    em = np.asarray(scene.materials.emission, np.float64)[mat]
    al = np.asarray(scene.materials.albedo, np.float64)[mat]
    sc = np.asarray(scene.materials.scatter, np.float64)[mat]
    return n0, n1, n2, mat, em, al, sc


def build_shaded_accel(
    scene, config: KDTreeConfig = KDTreeConfig(leaf_size=16),
    backend: str = "auto",
) -> ShadedWideBVH:
    """Binary SAH build -> stride-32 shaded leaf pack -> 8-wide collapse."""
    ls = int(config.leaf_size)
    if ls > RECS_PER_ROW and ls % RECS_PER_ROW != 0:
        raise ValueError(f"leaf_size {ls} must be <=4 or a multiple of 4")
    bvh = build_bvh(scene.mesh.vertices, scene.mesh.faces, config,
                    backend=backend)

    tp0 = np.asarray(bvh.tri_p0)
    te1 = np.asarray(bvh.tri_e1)
    te2 = np.asarray(bvh.tri_e2)
    tid = np.asarray(bvh.tri_orig_id)
    n0, n1, n2, mat, em, al, sc = _face_shading_np(scene)

    slots = tp0.shape[0]
    rows_per_leaf = max(1, ls // RECS_PER_ROW)
    num_leaves = max(1, slots // ls)
    tris = np.zeros((num_leaves * rows_per_leaf, 128), np.float32)
    flat = tris.reshape(-1, STRIDE32)       # one record per row
    # pad slots can never hit: p0 far away, zero edges
    flat[:, 0:3] = 1.0e30
    s = np.arange(slots)
    rec = (s // ls) * (rows_per_leaf * RECS_PER_ROW) + (s % ls)
    flat[rec, 0:3] = tp0
    flat[rec, 3:6] = te1
    flat[rec, 6:9] = te2
    flat[rec, 9] = tid.view(np.float32)
    real = tid >= 0
    t_real = tid[real]
    flat[rec[real], 10:13] = n0[t_real]
    flat[rec[real], 13:16] = n1[t_real]
    flat[rec[real], 16:19] = n2[t_real]
    flat[rec[real], 19] = mat[t_real].astype(np.float32)
    flat[rec[real], 20:23] = em[t_real]
    flat[rec[real], 23:26] = al[t_real]
    flat[rec[real], 26] = sc[t_real]

    # wide collapse shares the binary topology; HOST-side throughout
    # (accel.wide._collapse_wide_np) — no device round-trips: a d2h over
    # the axon relay costs seconds and serializes behind running kernels
    from atray_tpu.accel.wide import _collapse_wide_np

    cboxes, clinks, caxis, max_depth = _collapse_wide_np(bvh)
    # the collapse computed leaf_row with the 16-stride rows_per_leaf
    # (leaf_size // 8); recompute clinks leaf rows for stride 32
    rpl16 = max(1, ls // 8)
    is_leaf = (clinks < 0) & (clinks > -2147483647)
    leaf_row16 = -(clinks + 1)
    leaf_idx = leaf_row16 // rpl16
    leaf_row32 = leaf_idx * rows_per_leaf
    clinks = np.where(is_leaf, -(leaf_row32 + 1), clinks)

    lpt = max(1, int(config.leaves_per_treelet))
    # pad the record array to a whole number of treelets: the pair
    # kernel streams a treelet's full row range, and the LAST treelet of
    # an unpadded array would read past the end (measured: garbage
    # records fabricating hits with float-bit-pattern face ids)
    pad_leaves = (-num_leaves) % lpt
    if pad_leaves:
        pad_rows = np.zeros((pad_leaves * rows_per_leaf, 128), np.float32)
        pad_rows.reshape(-1, STRIDE32)[:, 0:3] = 1.0e30
        tris = np.concatenate([tris, pad_rows])
    tbox, n_treelets = _treelet_boxes_np(tris, ls, lpt)
    return ShadedWideBVH(
        cboxes=jnp.asarray(cboxes),
        clinks=jnp.asarray(clinks.astype(np.int32)),
        tris=jnp.asarray(tris),
        leaf_size=ls,
        num_nodes=cboxes.shape[0],
        max_depth=max_depth,
        caxis=jnp.asarray(caxis),
        tboxes=jnp.asarray(tbox),
        num_treelets=n_treelets,
        leaves_per_treelet=lpt,
        build_vertices=jnp.asarray(
            np.asarray(scene.mesh.vertices, np.float32)),
    )


def refit_shaded(accel: ShadedWideBVH, scene) -> ShadedWideBVH:
    """Device-side refit of the PRODUCTION accel (round 5, VERDICT r4
    weak #5): recompute the stride-32 shaded leaf records (geometry,
    vertex normals, material id + baked constants) from the CURRENT
    scene, rebuild the treelet boxes exactly, and conservatively expand
    the node boxes by the maximum vertex displacement since build — all
    in XLA inside the jitted step, like ``accel.wide.refit_wide`` for the
    unshaded accel. Topology (clinks, slot layout, static shapes) stays
    frozen, so vertex-optimization loops can keep the fused traversal
    kernel without host rebuilds or recompiles.

    Outputs are stop_gradient'ed: the tables drive the DISCRETE
    nearest-hit choice; gradients flow through the custom-VJP path
    replay, which reads the live scene (wavefront.make_fused_hit_shade).
    """
    if accel.build_vertices is None:
        raise ValueError("accel was built without refit support")
    import jax as _jax

    mesh = scene.mesh
    v = jnp.asarray(mesh.vertices)
    f = jnp.asarray(mesh.faces)
    nf = int(mesh.num_faces)

    # face ids live in record column 9 as bitcast f32 (denormals!) —
    # read and write ONLY through the int domain (float transport can be
    # FTZ-flushed; see refit_wide's hard-won note)
    flat_i = _jax.lax.bitcast_convert_type(accel.tris, jnp.int32)
    flat_i = flat_i.reshape(-1, STRIDE32)
    fid = flat_i[:, 9]
    ok = fid >= 0
    fcl = jnp.clip(fid, 0, max(nf - 1, 0))

    p0 = v[f[fcl, 0]]
    e1 = v[f[fcl, 1]] - p0
    e2 = v[f[fcl, 2]] - p0
    flat_n = jnp.cross(e1, e2)
    flat_n = flat_n / jnp.maximum(
        jnp.linalg.norm(flat_n, axis=1, keepdims=True), 1e-20
    )
    nidx = jnp.asarray(mesh.face_normal_idx)[fcl]
    has = (nidx[:, 0] >= 0)[:, None]
    ncl = jnp.clip(nidx, 0, jnp.asarray(mesh.normals).shape[0] - 1)
    norms = jnp.asarray(mesh.normals)
    n0 = jnp.where(has, norms[ncl[:, 0]], flat_n)
    n1 = jnp.where(has, norms[ncl[:, 1]], flat_n)
    n2 = jnp.where(has, norms[ncl[:, 2]], flat_n)
    mat = jnp.asarray(mesh.material_id)[fcl]
    em = jnp.asarray(scene.materials.emission)[mat]
    al = jnp.asarray(scene.materials.albedo)[mat]
    sc = jnp.asarray(scene.materials.scatter)[mat][:, None]

    okc = ok[:, None]
    geo = jnp.where(okc, jnp.concatenate([p0, e1, e2], axis=1),
                    _jax.lax.bitcast_convert_type(
                        flat_i[:, 0:9], jnp.float32))
    shade = jnp.where(
        okc,
        jnp.concatenate(
            [n0, n1, n2, mat.astype(jnp.float32)[:, None], em, al, sc],
            axis=1,
        ),
        _jax.lax.bitcast_convert_type(flat_i[:, 10:27], jnp.float32),
    )
    flat_i = jnp.concatenate([
        _jax.lax.bitcast_convert_type(geo, jnp.int32),
        flat_i[:, 9:10],
        _jax.lax.bitcast_convert_type(shade, jnp.int32),
        flat_i[:, 27:],
    ], axis=1)
    tris = _jax.lax.bitcast_convert_type(
        flat_i, jnp.float32).reshape(accel.tris.shape)

    # node boxes: conservative global-delta expansion (exact containment
    # for any displacement; culling efficiency degrades with the largest
    # move — the right trade for refinement steps)
    delta = jnp.max(jnp.abs(v - accel.build_vertices))
    cb = accel.cboxes
    cboxes = jnp.concatenate(
        [cb[:, 0:24] - delta, cb[:, 24:48] + delta, cb[:, 48:]], axis=1)

    tboxes = accel.tboxes
    if accel.num_treelets > 0 and tboxes is not None:
        # treelet boxes: recomputed EXACTLY from the new records (cheap
        # reduction), one-ulp outward so f32 summation round-off can
        # never shrink a box past a triangle
        va = p0
        vb = p0 + e1
        vc = p0 + e2
        big = jnp.float32(1.0e30)
        lo = jnp.where(okc, jnp.minimum(jnp.minimum(va, vb), vc), big)
        hi = jnp.where(okc, jnp.maximum(jnp.maximum(va, vb), vc), -big)
        tpt = accel.leaves_per_treelet * accel.leaf_size
        T = accel.num_treelets
        tlo = lo.reshape(T, tpt, 3).min(axis=1)
        thi = hi.reshape(T, tpt, 3).max(axis=1)
        empty = (tlo > thi).any(axis=1)[:, None]
        nan = jnp.float32(jnp.nan)
        tlo = jnp.where(empty, nan, jnp.nextafter(tlo, -jnp.inf))
        thi = jnp.where(empty, nan, jnp.nextafter(thi, jnp.inf))
        rows = tboxes.shape[0]
        padn = rows * 8 - T
        tlo = jnp.concatenate([tlo, jnp.full((padn, 3), nan)])
        thi = jnp.concatenate([thi, jnp.full((padn, 3), nan)])
        cols = [tlo[:, ax].reshape(rows, 8) for ax in range(3)]
        cols += [thi[:, ax].reshape(rows, 8) for ax in range(3)]
        tboxes = jnp.concatenate(
            cols + [jnp.zeros((rows, 128 - 48), jnp.float32)], axis=1)

    sg = _jax.lax.stop_gradient
    return dataclasses.replace(
        accel, tris=sg(tris), cboxes=sg(cboxes), tboxes=sg(tboxes),
    )
