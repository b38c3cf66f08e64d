"""8-wide BVH: collapse of the binary SAH BVH for the TPU walk kernel.

Why wide: the Pallas walk pays one vector->scalar sync per *node visit*
(the hardware cost that dominates traversal — see kernels/frustum_pallas.py).
An 8-ary node amortizes that sync over 8 child box tests performed as one
vectorized interval test (children live in lanes). Fewer, fatter nodes is
also the reference's own intuition (its "KD tree" is 8-ary,
kd_tree.cpp:67-288) — here it is chosen for sync amortization, not cache
lines.

Collapse algorithm: starting from the binary root, repeatedly expand the
cut node with the largest surface area until the cut has 8 subtrees (or
only leaves remain); each cut entry becomes a child slot. Binary leaves
map to leaf slots pointing at the packed triangle rows of
kernels.traverse_pallas.pack_bvh.

Child-slot encoding (``clinks`` (8, W) i32):
- internal child: wide-node id (>= 0)
- leaf child:     -(leaf_row + 1)   (<= -1)
- empty slot:     INT32_MIN (and its box is inverted so it never overlaps)

``cboxes`` (W, 128) f32 puts field f of child c at lane 8*f + c, so the
kernel slices six (1, 8) field rows statically and tests all 8 children in
lanes with no data shuffling.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from atray_tpu.accel.bvh import BVH

EMPTY = np.int32(-2147483648)
WIDTH = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WideBVH:
    """Device tables for the wide-BVH walk kernel."""

    cboxes: jnp.ndarray   # f32 (W, 128): child c field f at lane 8f+c
    clinks: jnp.ndarray   # i32 (8, W): see encoding above
    tris: jnp.ndarray     # f32 leaf rows (shared layout with TreePack)
    leaf_size: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    max_depth: int = dataclasses.field(metadata=dict(static=True))
    # which Pallas kernel drives this accel: "exact" (single-block, best
    # coherent) or "exact2" (two-block interleaved, ~25% faster on
    # incoherent bounce rays). The renderer picks per bounce phase.
    variant: str = dataclasses.field(default="exact", metadata=dict(static=True))
    # per-node child sort axis (1, W) i32: children are stored sorted by
    # centroid ASCENDING along this axis, so a traversal kernel can pop
    # near children first (push far-to-near from the ray direction's
    # sign) — fewer leaf visits once best_t tightens (Embree-style
    # ordered traversal, approximated by one axis per node).
    caxis: jnp.ndarray = None        # i32 (1, W)
    # refit support (optional): original face index per leaf slot and the
    # vertex array the tables were built from — see ``refit_wide``.
    slot_face: jnp.ndarray = None    # i32 (slots,); -1 = pad slot
    build_vertices: jnp.ndarray = None  # f32 (V, 3)

    @property
    def rows_per_leaf(self) -> int:
        return max(1, self.leaf_size // 8)


def _collapse_wide_np(bvh: BVH):
    """Collapse a flattened binary BVH (skip-link form) into 8-wide tables,
    entirely HOST-side (numpy in, numpy out).

    Returns (cboxes (W,128) f32, clinks (8,W) i32, caxis (1,W) i32,
    max_depth). Kept numpy so callers that post-process the tables
    (accel/shaded.py rewrites leaf rows for its stride-32 layout) never
    round-trip through the device — a d2h over the axon relay costs
    seconds and serializes behind running kernels.
    """
    miss = np.asarray(bvh.node_miss)
    leaf_start = np.asarray(bvh.leaf_start)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    k = miss.shape[0]
    ls = bvh.leaf_size
    rows_per_leaf = max(1, ls // 8)

    # Reconstruct binary children from the skip-link preorder layout:
    # interior node i has left child i+1; right child = miss link of i+1
    # (the node after the left subtree).
    left = np.full(k, -1, np.int64)
    right = np.full(k, -1, np.int64)
    interior = leaf_start < 0
    for i in range(k):
        if interior[i]:
            l = i + 1
            left[i] = l
            r = miss[l] if miss[l] >= 0 else -1
            # the right child is the next node after the left subtree; if
            # the left subtree's miss link exits this node's subtree the
            # right child is absent (cannot happen in a proper binary tree)
            right[i] = r

    def area(i):
        d = np.maximum(nmax[i] - nmin[i], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    wide_children: List[List[int]] = []   # binary node ids per wide node
    wide_of_binary = {}

    def collapse(b: int) -> int:
        """Create the wide node for binary interior node b; returns id."""
        me = len(wide_children)
        wide_children.append([])
        cut = [b]
        while len(cut) < WIDTH:
            # expand the largest-area interior entry
            best_j, best_a = -1, -1.0
            for j, nb in enumerate(cut):
                if interior[nb]:
                    a = area(nb)
                    if a > best_a:
                        best_j, best_a = j, a
            if best_j < 0:
                break
            nb = cut.pop(best_j)
            cut.extend([left[nb], right[nb]])
        wide_children[me] = cut
        return me

    order = [collapse(0)] if interior[0] else []
    if not interior[0]:
        # degenerate: root is a single leaf — make one wide node holding it
        wide_children.append([0])
        order = [0]

    # BFS: materialize wide nodes for interior cut entries
    w = 0
    while w < len(wide_children):
        cut = wide_children[w]
        for j, nb in enumerate(cut):
            if interior[nb]:
                cut[j] = ("node", collapse(nb), nb)
            else:
                cut[j] = ("leaf", int(leaf_start[nb]) // ls * rows_per_leaf, nb)
        w += 1

    nw = len(wide_children)
    cboxes = np.zeros((nw, 128), np.float32)
    # empty slots: inverted box (lo > hi) that can never overlap
    for f in range(3):
        cboxes[:, 8 * f : 8 * f + 8] = 3.0e38
        cboxes[:, 8 * (f + 3) : 8 * (f + 3) + 8] = -3.0e38
    clinks = np.full((WIDTH, nw), EMPTY, np.int32)
    caxis = np.zeros((1, nw), np.int32)
    depth = np.zeros(nw, np.int64)
    for wnode, cut in enumerate(wide_children):
        # ordered-traversal support: sort the children by centroid along
        # the axis of max centroid spread (ascending) and record that axis
        # so the kernel can pop near-first from the ray direction's sign
        cents = np.array([(nmin[e[2]] + nmax[e[2]]) * 0.5 for e in cut])
        if len(cut) > 1:
            axis = int(np.argmax(cents.max(axis=0) - cents.min(axis=0)))
            cut = [cut[j] for j in np.argsort(cents[:, axis], kind="stable")]
            caxis[0, wnode] = axis
        for c, entry in enumerate(cut):
            kind, idx, nb = entry
            for f in range(3):
                cboxes[wnode, 8 * f + c] = nmin[nb][f]
                cboxes[wnode, 8 * (f + 3) + c] = nmax[nb][f]
            if kind == "node":
                clinks[c, wnode] = idx
            else:
                clinks[c, wnode] = -(idx + 1)
    # depth for stack sizing
    def compute_depth(wnode, d):
        depth[wnode] = d
        for c in range(WIDTH):
            l = clinks[c, wnode]
            if l >= 0:
                compute_depth(l, d + 1)

    import sys

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))
    compute_depth(0, 1)

    return cboxes, clinks, caxis, int(depth.max())


def build_wide_bvh(bvh: BVH, tris_packed: jnp.ndarray) -> WideBVH:
    """Collapse a flattened binary BVH into 8-wide device tables.

    ``tris_packed`` is TreePack.tris (the leaf rows are reused verbatim —
    leaf_row indexing is identical).
    """
    cboxes, clinks, caxis, max_depth = _collapse_wide_np(bvh)
    return WideBVH(
        cboxes=jnp.asarray(cboxes),
        clinks=jnp.asarray(clinks),
        tris=tris_packed,
        leaf_size=bvh.leaf_size,
        num_nodes=cboxes.shape[0],
        max_depth=max_depth,
        caxis=jnp.asarray(caxis),
    )


def wide_from_mesh(vertices, faces, config=None) -> WideBVH:
    """Convenience: binary SAH build -> pack -> 8-wide collapse."""
    import numpy as _np

    from atray_tpu.accel.bvh import build_bvh
    from atray_tpu.config import KDTreeConfig
    from atray_tpu.kernels.traverse_pallas import pack_bvh

    cfg = config or KDTreeConfig(leaf_size=8)
    bvh = build_bvh(vertices, faces, cfg)
    pack = pack_bvh(bvh)
    wide = build_wide_bvh(bvh, pack.tris)
    return dataclasses.replace(
        wide,
        slot_face=jnp.asarray(_np.asarray(bvh.tri_orig_id, _np.int32)),
        build_vertices=jnp.asarray(_np.asarray(vertices, _np.float32)),
    )


def refit_wide(accel: WideBVH, vertices, faces) -> WideBVH:
    """Device-side refit: recompute leaf triangle records from CURRENT
    vertices and conservatively expand every child box by the maximum
    vertex displacement since build.

    The TPU-idiomatic answer to moving geometry inside a jitted
    optimization step (SURVEY.md §7 arch item 6): topology (clinks, slot
    layout, static shapes) is frozen at build; only the *data* is
    recomputed, entirely in XLA — no host rebuild, no recompilation. The
    global-delta box expansion keeps containment exact for any
    displacement at the cost of culling efficiency proportional to the
    largest move, which is the right trade for refinement loops (steps are
    small). Rebuild from scratch when the geometry changes wholesale.

    All outputs are wrapped in stop_gradient: the tables drive the
    DISCRETE nearest-hit decision only; the differentiable recompute
    (render.wavefront.resolve_hit) reads the live scene.
    """
    import numpy as _np

    if accel.slot_face is None or accel.build_vertices is None:
        raise ValueError("accel was built without refit support")
    v = jnp.asarray(vertices)
    f = jnp.asarray(faces)
    fid = accel.slot_face
    slots = fid.shape[0]
    ls = accel.leaf_size
    rows_per_leaf = accel.rows_per_leaf
    nf = f.shape[0]

    fcl = jnp.clip(fid, 0, max(nf - 1, 0))
    p0 = v[f[fcl, 0]]
    e1 = v[f[fcl, 1]] - p0
    e2 = v[f[fcl, 2]] - p0
    ok = (fid >= 0)[:, None]

    # The scatter runs ENTIRELY in the int32 bit domain: column 9 holds
    # face ids bitcast to f32 (denormals!) and any float-typed transport of
    # them can be flushed to zero (FTZ) by the compiled program — observed
    # under jax.grad, where the autodiff-built XLA program zeroed every id
    # while the forward-only program preserved them. Bits through int ops
    # are immune.
    flat_i = jax.lax.bitcast_convert_type(
        accel.tris, jnp.int32
    ).reshape(-1, 16)
    s = _np.arange(slots)
    rec = (s // ls) * (rows_per_leaf * 8) + (s % ls)   # static indices
    orig_rows_i = flat_i[rec]
    new9 = jnp.where(ok, jnp.concatenate([p0, e1, e2], axis=1),
                     jax.lax.bitcast_convert_type(
                         orig_rows_i[:, 0:9], jnp.float32))
    new9_i = jax.lax.bitcast_convert_type(new9, jnp.int32)
    flat_i = flat_i.at[rec].set(
        jnp.concatenate([new9_i, orig_rows_i[:, 9:]], axis=1)
    )
    tris = jax.lax.bitcast_convert_type(
        flat_i.reshape(-1, accel.tris.shape[-1]), jnp.float32
    ).reshape(accel.tris.shape)

    delta = jnp.max(jnp.abs(v - accel.build_vertices))
    cb = accel.cboxes
    cboxes = jnp.concatenate(
        [cb[:, 0:24] - delta, cb[:, 24:48] + delta, cb[:, 48:]], axis=1
    )
    return dataclasses.replace(
        accel,
        tris=jax.lax.stop_gradient(tris),
        cboxes=jax.lax.stop_gradient(cboxes),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridAccel:
    """Coherence-split accelerator: the renderer uses ``wide`` (persistent
    frustum kernel, measured ~60 Mrays/s/chip coherent on v5e) for primary
    rays and ``pack`` (packet kernel with exact per-ray culling, ~5 Mrays/s
    incoherent vs ~0.7 for the frustum walk) for bounce rays. Both share
    the same leaf triangle rows."""

    wide: WideBVH
    pack: "TreePack"  # type: ignore[name-defined]


def make_accel(vertices, faces, config=None) -> WideBVH:
    """Build the geometry-only accelerator: the 8-wide BVH driven by the
    persistent exact kernel (kernels/wide_exact.py).

    This is the right accel for parameter-OPTIMIZATION loops (its leaf rows
    hold only geometry; shading reads live scene params via the gather
    path). For forward rendering, prefer ``accel.build_shaded_accel`` —
    the fused traversal+shading kernel with zero per-ray gathers."""
    return wide_from_mesh(vertices, faces, config)
