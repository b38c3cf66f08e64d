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
    """Wide-BVH tables with shaded stride-32 leaf records."""

    cboxes: jnp.ndarray   # f32 (W, 128)
    clinks: jnp.ndarray   # i32 (8, W)
    tris: jnp.ndarray     # f32 (rows_per_leaf * num_leaves, 128), stride 32
    leaf_size: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    max_depth: int = dataclasses.field(metadata=dict(static=True))
    # child sort axis per node (1, W) i32 — see accel.wide.WideBVH.caxis
    caxis: jnp.ndarray = None

    @property
    def rows_per_leaf(self) -> int:
        return max(1, self.leaf_size // RECS_PER_ROW)


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

    return ShadedWideBVH(
        cboxes=jnp.asarray(cboxes),
        clinks=jnp.asarray(clinks.astype(np.int32)),
        tris=jnp.asarray(tris),
        leaf_size=ls,
        num_nodes=cboxes.shape[0],
        max_depth=max_depth,
        caxis=jnp.asarray(caxis),
    )
