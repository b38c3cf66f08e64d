"""Treelet (geometry-sharded) rendering: rays ride the ICI ring.

SURVEY.md §5.7's documented scale-out for scenes exceeding per-chip HBM —
the ring-attention analog. The triangle set is partitioned spatially into
one treelet per device; each device keeps ONLY its treelet resident (like a
KV shard) while the per-device ray block rotates around the ring via
``jax.lax.ppermute`` (§5.8). After ``n_devices`` hops every ray has been
tested against every treelet, carries its global nearest hit + shading
payload (t, interpolated normal, material id), and is back on its home
device, where shading proceeds exactly as in the replicated-scene path
(render/wavefront.py, via its ``hit_override`` seam).

Contrast with the reference: its only scaling axis is image tiles over
shared-memory threads (renderer.cpp:403-455) — geometry is always fully
resident. This module is the axis it lacks: scene-size scaling over
devices with explicit interconnect collectives.

Determinism: the ray payload includes nothing layout-dependent; PRNG stays
keyed by (key, global ray id, bounce), so the treelet render matches the
single-device render to float tolerance (the only reordering is which
treelet is tested first — ties between equal-t hits may break differently).

The per-hop local query here is the brute-force Möller–Trumbore batch
(core/intersect.py) over the treelet's padded record table — the oracle
path. NEE shadow rays ride a second, leaner ring (``ring_occlusion_t``).

Gradients (sharded path replay): pass a ``TreeletParts`` to
``render_treelet`` and the record tables are built IN-GRAPH from the scene
(``treelet_records``), so they are a differentiable function of
vertices/normals/materials. The discrete ring (which face wins) stays
detached — same convention as the replicated ``nearest_hit_ids`` — and the
continuous recompute gathers each home ray's winning record row through a
SECOND, differentiable ppermute ring (``diff_row_pickup``): the row gather
against the resident shard is the sharded analog of the replicated path's
face-table row gather, and its transpose (a scatter-add into the owning
shard) is derived automatically. NOTE on residency: ``TreeletParts`` is
gradient-correct but its parameters stay REPLICATED (the face table is
gathered from the full scene in the global program — only ray-side work
is sharded). For scenes whose geometry must never be resident on one
chip, use ``TreeletShards`` (``build_treelet_shards``): the vertex/normal
slices are born P-sharded, each device builds its record table inside
shard_map from its own slices (``shard_records``), and gradients land on
the per-shard copies (``merge_vertex_grads`` reconciles duplicated
boundary vertices).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from atray_tpu.config import RenderSettings
from atray_tpu.core.camera import Camera, camera_rays
from atray_tpu.core.intersect import INF, moller_trumbore, normalize
from atray_tpu.render.wavefront import (
    build_face_table,
    from_tile_order,
    to_tile_order,
    trace_radiance,
)
from atray_tpu.scene.data import Scene, dataclasses as _dc  # noqa: F401


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TreeletGeom:
    """Spatially partitioned, padded triangle records.

    ``recs``: (P, Tpad, 20) f32 — per part, rows in face-table layout
    [p0(3), e1(3), e2(3), n0(3), n1(3), n2(3), material_id, global_face_id]
    (wavefront.build_face_table with the pad slot carrying the id). Pad
    rows are all-zero: degenerate edges make the Möller–Trumbore
    determinant 0, so they can never register a hit.
    """

    recs: jnp.ndarray

    @property
    def num_parts(self) -> int:
        return self.recs.shape[0]


def partition_faces(vertices: np.ndarray, faces: np.ndarray, n_parts: int):
    """Balanced spatial partition of faces: sort by centroid along the
    longest axis of the centroid bounding box, split into ``n_parts``
    contiguous chunks (sizes differ by <= 1). Host-side numpy.

    Returns a list of int index arrays (a permutation of arange(T) split
    into parts). Spatial contiguity keeps each treelet's bounding volume
    tight, which is what bounds per-hop work for real scenes.
    """
    t = faces.shape[0]
    if t == 0:
        return [np.zeros((0,), np.int64) for _ in range(n_parts)]
    cent = vertices[faces].mean(axis=1)  # (T, 3)
    spread = cent.max(axis=0) - cent.min(axis=0)
    order = np.argsort(cent[:, int(np.argmax(spread))], kind="stable")
    return np.array_split(order, n_parts)


def build_treelets(scene: Scene, n_parts: int) -> TreeletGeom:
    """Partition the scene's mesh into ``n_parts`` padded record tables."""
    ft = build_face_table(scene)
    if ft is None:
        raise ValueError("treelet sharding needs a non-empty mesh")
    ft = np.array(ft)  # writable copy
    ft[:, 19] = np.arange(ft.shape[0], dtype=np.float32)  # global face id
    parts = partition_faces(
        np.asarray(scene.mesh.vertices), np.asarray(scene.mesh.faces), n_parts
    )
    tpad = max(1, max(len(p) for p in parts))
    recs = np.zeros((n_parts, tpad, 20), np.float32)
    for i, idx in enumerate(parts):
        recs[i, : len(idx)] = ft[idx]
        recs[i, len(idx):, 19] = -1.0
    return TreeletGeom(recs=jnp.asarray(recs))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TreeletParts:
    """Static spatial partition of the face set — the DIFFERENTIABLE
    treelet backend's build product. Only indices live here; the actual
    record tables are rebuilt in-graph from the scene every call
    (``treelet_records``), so gradients flow from rendered pixels back to
    vertices/normals/materials. NOTE: this backend is gradient-correct
    under geometry sharding but its PARAMETERS stay replicated (the scene
    pytree is visible on every device); for true sharded parameter
    residency use ``TreeletShards``/``build_treelet_shards``.

    ``idx``: (P, Tpad) i32 — face indices per part, -1 pad.
    ``owner``: (T,) i32 — owning part per global face id.
    ``lrow``: (T,) i32 — local row of that face in its owner's table.
    (Two O(T) arrays instead of a dense (P, T) ownership map — the map
    has only T non-(-1) entries, so O(P*T) storage would dominate the
    very memory budget this path exists to relieve.)
    """

    idx: jnp.ndarray
    owner: jnp.ndarray
    lrow: jnp.ndarray

    @property
    def num_parts(self) -> int:
        return self.idx.shape[0]


def _check_fid_precision(num_faces: int) -> None:
    """Global face ids ride f32 record slots (col 19) — exact only below
    2^24. Fail loudly instead of silently corrupting ownership lookups."""
    if num_faces >= 2 ** 24:
        raise ValueError(
            f"treelet face ids ride f32 record slots, exact only below "
            f"2^24; scene has {num_faces} faces — carry fid in a separate "
            f"i32 plane before going this large"
        )


def build_treelet_parts(scene: Scene, n_parts: int) -> TreeletParts:
    """Host-side spatial partition (indices only) for the differentiable
    treelet path."""
    _check_fid_precision(int(scene.mesh.num_faces))
    parts = partition_faces(
        np.asarray(scene.mesh.vertices), np.asarray(scene.mesh.faces), n_parts
    )
    t = int(scene.mesh.num_faces)
    tpad = max(1, max(len(p) for p in parts))
    idx = np.full((n_parts, tpad), -1, np.int32)
    owner = np.zeros((max(1, t),), np.int32)
    lrow = np.zeros((max(1, t),), np.int32)
    for i, p in enumerate(parts):
        idx[i, : len(p)] = p
        owner[p] = i
        lrow[p] = np.arange(len(p), dtype=np.int32)
    return TreeletParts(
        idx=jnp.asarray(idx), owner=jnp.asarray(owner), lrow=jnp.asarray(lrow)
    )


def treelet_records(scene: Scene, parts: TreeletParts) -> jnp.ndarray:
    """(P, Tpad, 20) per-part record tables built IN-GRAPH: a jnp gather of
    ``build_face_table(scene)`` rows by the static partition indices, so the
    result is a differentiable function of the scene parameters (the
    backward scatters row cotangents into d(vertices)/d(normals)). Pad
    rows are zero (degenerate — can never hit) with face id -1; real rows
    carry their GLOBAL face id in the pad slot (col 19)."""
    ft = build_face_table(scene)
    if ft is None:
        raise ValueError("treelet sharding needs a non-empty mesh")
    t = ft.shape[0]
    _check_fid_precision(t)
    ft = ft.at[:, 19].set(jnp.arange(t, dtype=jnp.float32))
    safe = jnp.clip(parts.idx, 0, t - 1)
    recs = ft[safe]                                    # (P, Tpad, 20)
    pad = (parts.idx < 0)[:, :, None]
    pad_row = jnp.zeros((20,), jnp.float32).at[19].set(-1.0)
    return jnp.where(pad, pad_row, recs)


def diff_row_pickup(
    recs_local: jnp.ndarray,   # (1, Tpad, 20) — THIS device's record shard
    owner: jnp.ndarray,        # (T,) i32 — owning part per global face id
    lrow: jnp.ndarray,         # (T,) i32 — local row in the owner's table
    fid: jnp.ndarray,          # (R,) i32 global winning face ids (detached)
    n_parts: int,
    axis_name: str = "rays",
) -> jnp.ndarray:
    """DIFFERENTIABLE gather of each home ray's winning record row from
    whichever device owns the face: (fid, row) ride the ring; at each hop
    the resident device fills in rows it owns (``owner[f] == my part``,
    local row ``lrow[f]`` — two O(T) replicated index arrays, not a dense
    (P, T) map). After ``n_parts`` hops every ray is home carrying its
    row. ``ppermute`` and the per-hop shard gather are both linear, so
    reverse-mode derives the exact transpose: row cotangents ride the
    ring back and scatter-add into the owning shard's ``recs`` — the
    sharded face-table gather of the replicated path (resolve_hit). Rays
    with fid < 0 keep a zero row.
    """
    r = fid.shape[0]
    tpad = recs_local.shape[1]
    t = owner.shape[0]
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]

    def hop(_, st):
        f, row = st
        fc = jnp.clip(f, 0, t - 1)
        own = (f >= 0) & (owner[fc] == me)
        mine = recs_local[0, jnp.clip(lrow[fc], 0, tpad - 1)]
        row = jnp.where(own[:, None], mine, row)
        f = jax.lax.ppermute(f, axis_name, perm)
        row = jax.lax.ppermute(row, axis_name, perm)
        return f, row

    _, row = jax.lax.fori_loop(
        0, n_parts, hop, (fid, jnp.zeros((r, 20), recs_local.dtype))
    )
    return row


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TreeletShards:
    """Geometry parameters BORN SHARDED: per-part local vertex/normal
    slices plus locally-indexed faces. Unlike ``TreeletParts`` (whose
    record tables are gathered in-graph from a REPLICATED scene, so every
    device still holds the full geometry), each device's record table here
    is built inside shard_map from ITS OWN (P-sharded) slices — no device
    ever materializes another part's vertices, in the primal or in the
    cotangent. This is the true beyond-HBM parameter-residency path.

    Differentiable leaves: ``vertices`` (P, Vpad, 3) and ``normals``
    (P, Npad, 3) — optimize these directly. Vertices shared by faces in
    different parts are DUPLICATED across shards; their gradients arrive
    per-copy and ``merge_vertex_grads``/``merge_normal_grads`` scatter-add
    them back to the global arrays (for parity tests or synchronized
    updates).

    Index planes (non-differentiable): ``faces``/``fnidx`` (P, Tpad, 3)
    local vertex/normal indices (fnidx -1 = flat shading), ``matid``/
    ``fid`` (P, Tpad) material + global face ids (-1 pad), ``v_gid``/
    ``n_gid`` (P, Vpad)/(P, Npad) global ids of each local slot (-1 pad),
    ``owner``/``lrow`` (T,) the O(T) ownership maps for the row-pickup
    ring.
    """

    vertices: jnp.ndarray
    normals: jnp.ndarray
    faces: jnp.ndarray
    fnidx: jnp.ndarray
    matid: jnp.ndarray
    fid: jnp.ndarray
    v_gid: jnp.ndarray
    n_gid: jnp.ndarray
    owner: jnp.ndarray
    lrow: jnp.ndarray

    @property
    def num_parts(self) -> int:
        return self.faces.shape[0]


def build_treelet_shards(scene: Scene, n_parts: int) -> TreeletShards:
    """Host-side build of the sharded-residency treelet parameters: spatial
    face partition (``partition_faces``), then per part the referenced
    vertices/normals are sliced out and faces re-indexed locally. All
    tables pad to the max size across parts (static shapes for pjit)."""
    _check_fid_precision(int(scene.mesh.num_faces))
    v = np.asarray(scene.mesh.vertices)
    nrm = np.asarray(scene.mesh.normals)
    f = np.asarray(scene.mesh.faces)
    fn = np.asarray(scene.mesh.face_normal_idx)
    mid = np.asarray(scene.mesh.material_id)
    parts = partition_faces(v, f, n_parts)

    loc = []
    for i, p in enumerate(parts):
        pf = f[p]                                     # (n_i, 3) global vids
        vu, vinv = np.unique(pf, return_inverse=True)
        lf = vinv.reshape(pf.shape).astype(np.int32)
        pfn = fn[p] if fn.size else np.full((len(p), 3), -1, np.int64)
        used = pfn[pfn >= 0]
        nu = np.unique(used) if used.size else np.zeros((0,), np.int64)
        remap = np.full((nrm.shape[0] + 1,), -1, np.int32)
        remap[nu] = np.arange(len(nu), dtype=np.int32)
        lfn = np.where(pfn >= 0, remap[np.clip(pfn, 0, nrm.shape[0])], -1)
        loc.append((p, vu, lf, nu, lfn.astype(np.int32)))

    vpad = max(1, max(len(x[1]) for x in loc))
    npad = max(1, max(len(x[3]) for x in loc))
    tpad = max(1, max(len(x[0]) for x in loc))
    t = int(scene.mesh.num_faces)

    verts = np.zeros((n_parts, vpad, 3), np.float32)
    norms = np.zeros((n_parts, npad, 3), np.float32)
    faces = np.zeros((n_parts, tpad, 3), np.int32)
    fnidx = np.full((n_parts, tpad, 3), -1, np.int32)
    matid = np.zeros((n_parts, tpad), np.int32)
    fid = np.full((n_parts, tpad), -1, np.int32)
    v_gid = np.full((n_parts, vpad), -1, np.int32)
    n_gid = np.full((n_parts, npad), -1, np.int32)
    owner = np.zeros((max(1, t),), np.int32)
    lrow = np.zeros((max(1, t),), np.int32)
    for i, (p, vu, lf, nu, lfn) in enumerate(loc):
        k = len(p)
        verts[i, : len(vu)] = v[vu]
        if len(nu):
            norms[i, : len(nu)] = nrm[nu]
        faces[i, :k] = lf
        fnidx[i, :k] = lfn
        matid[i, :k] = mid[p]
        fid[i, :k] = p
        v_gid[i, : len(vu)] = vu
        n_gid[i, : len(nu)] = nu
        owner[p] = i
        lrow[p] = np.arange(k, dtype=np.int32)
    return TreeletShards(
        vertices=jnp.asarray(verts), normals=jnp.asarray(norms),
        faces=jnp.asarray(faces), fnidx=jnp.asarray(fnidx),
        matid=jnp.asarray(matid), fid=jnp.asarray(fid),
        v_gid=jnp.asarray(v_gid), n_gid=jnp.asarray(n_gid),
        owner=jnp.asarray(owner), lrow=jnp.asarray(lrow),
    )


def shard_records(v, nrm, f, fnidx, matid, fid) -> jnp.ndarray:
    """(Tpad, 20) record table of ONE part, built in-graph from that
    part's LOCAL slices — the per-shard analog of
    ``wavefront.build_face_table`` (same layout, global fid in col 19).
    Differentiable w.r.t. ``v`` and ``nrm``; call inside shard_map so the
    build (and its transpose) touches only the resident shard."""
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    flat_n = normalize(jnp.cross(e1, e2))
    has_smooth = (fnidx[:, 0] >= 0)[:, None]
    ncl = jnp.clip(fnidx, 0, nrm.shape[0] - 1)
    n0 = jnp.where(has_smooth, nrm[ncl[:, 0]], flat_n)
    n1 = jnp.where(has_smooth, nrm[ncl[:, 1]], flat_n)
    n2 = jnp.where(has_smooth, nrm[ncl[:, 2]], flat_n)
    recs = jnp.concatenate(
        [p0, e1, e2, n0, n1, n2,
         matid.astype(jnp.float32)[:, None],
         fid.astype(jnp.float32)[:, None]], axis=1,
    )
    pad_row = jnp.zeros((20,), jnp.float32).at[19].set(-1.0)
    return jnp.where((fid < 0)[:, None], pad_row, recs)


def merge_vertex_grads(
    shards: TreeletShards, g_vertices: jnp.ndarray, num_vertices: int
) -> jnp.ndarray:
    """Scatter-add per-copy vertex cotangents (P, Vpad, 3) back to the
    global (V, 3) array — boundary vertices duplicated across parts sum,
    matching the replicated path's gradients exactly."""
    gid = shards.v_gid.reshape(-1)
    w = (gid >= 0).astype(g_vertices.dtype)[:, None]
    flat = g_vertices.reshape(-1, 3) * w
    safe = jnp.clip(gid, 0, max(num_vertices - 1, 0))
    return jnp.zeros((num_vertices, 3), g_vertices.dtype).at[safe].add(flat)


def merge_normal_grads(
    shards: TreeletShards, g_normals: jnp.ndarray, num_normals: int
) -> jnp.ndarray:
    """Normals analog of ``merge_vertex_grads``."""
    gid = shards.n_gid.reshape(-1)
    w = (gid >= 0).astype(g_normals.dtype)[:, None]
    flat = g_normals.reshape(-1, 3) * w
    safe = jnp.clip(gid, 0, max(num_normals - 1, 0))
    return jnp.zeros((num_normals, 3), g_normals.dtype).at[safe].add(flat)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TreeletAccels:
    """Per-treelet ShadedWideBVH tables, padded to COMMON static shapes and
    stacked on a leading parts axis so they shard over the device mesh with
    ``P('parts')`` — the production-speed treelet backend (the brute-force
    ``TreeletGeom`` path is the oracle). Leaf records carry GLOBAL face ids
    (remapped after each sub-build), so hit payloads are layout-invariant.
    """

    cboxes: jnp.ndarray   # f32 (P, W, 128)
    clinks: jnp.ndarray   # i32 (P, 8, W)
    caxis: jnp.ndarray    # i32 (P, 1, W)
    tris: jnp.ndarray     # f32 (P, rows, 128) stride-32 shaded records
    leaf_size: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    max_depth: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_parts(self) -> int:
        return self.cboxes.shape[0]

    def local(self, cb, cl, ax, tr):
        """Reassemble ONE device's shard (leading axis 1) into the
        ShadedWideBVH the fused kernel consumes."""
        from atray_tpu.accel.shaded import ShadedWideBVH

        return ShadedWideBVH(
            cboxes=cb[0], clinks=cl[0], tris=tr[0], caxis=ax[0],
            leaf_size=self.leaf_size, num_nodes=self.num_nodes,
            max_depth=self.max_depth,
        )


def build_treelet_accels(scene: Scene, n_parts: int, config=None):
    """Spatially partition the mesh and build one shaded wide-BVH per part.

    Tables are padded to the max node/leaf-row counts across parts (pad
    nodes are never linked, pad records can never hit) and the baked face
    ids are remapped to GLOBAL indices.
    """
    import numpy as np

    from atray_tpu.accel.shaded import build_shaded_accel
    from atray_tpu.config import KDTreeConfig

    cfg = config or KDTreeConfig(leaf_size=16)
    faces = np.asarray(scene.mesh.faces)
    if faces.shape[0] < n_parts:
        raise ValueError(
            f"treelet accels need >= {n_parts} faces, got {faces.shape[0]}"
        )
    parts = partition_faces(np.asarray(scene.mesh.vertices), faces, n_parts)
    accs = []
    for idx in parts:
        sub = dataclasses.replace(
            scene,
            mesh=dataclasses.replace(
                scene.mesh,
                faces=scene.mesh.faces[idx],
                face_normal_idx=scene.mesh.face_normal_idx[idx],
                face_tex_idx=scene.mesh.face_tex_idx[idx],
                material_id=scene.mesh.material_id[idx],
            ),
        )
        acc = build_shaded_accel(sub, cfg)
        # remap the baked LOCAL face ids (lane 9, bitcast) to global ones
        tris = np.array(acc.tris)   # writable copy (asarray views are RO)
        flat = tris.reshape(-1, 32)
        tid = flat[:, 9].view(np.int32).copy()
        real = tid >= 0
        tid[real] = np.asarray(idx, np.int64)[tid[real]].astype(np.int32)
        flat[:, 9] = tid.view(np.float32)
        accs.append(dataclasses.replace(acc, tris=jnp.asarray(tris)))

    w = max(a.num_nodes for a in accs)
    rows = max(a.tris.shape[0] for a in accs)
    cb = np.zeros((n_parts, w, 128), np.float32)
    # pad nodes: inverted boxes (never overlap) — they are also unreachable
    for f in range(3):
        cb[:, :, 8 * f : 8 * f + 8] = 3.0e38
        cb[:, :, 8 * (f + 3) : 8 * (f + 3) + 8] = -3.0e38
    cl = np.full((n_parts, 8, w), np.int32(-2147483648), np.int32)
    ax = np.zeros((n_parts, 1, w), np.int32)
    tr = np.zeros((n_parts, rows, 128), np.float32)
    tr.reshape(n_parts, -1, 32)[:, :, 0:3] = 1.0e30   # pad records miss
    tr.reshape(n_parts, -1, 32)[:, :, 9] = np.float32(
        np.array([-1], np.int32).view(np.float32)[0]
    )
    for i, a in enumerate(accs):
        cb[i, : a.num_nodes] = np.asarray(a.cboxes)
        cl[i, :, : a.num_nodes] = np.asarray(a.clinks)
        ax[i, :, : a.num_nodes] = np.asarray(a.caxis)
        tr[i, : a.tris.shape[0]] = np.asarray(a.tris)
    return TreeletAccels(
        cboxes=jnp.asarray(cb),
        clinks=jnp.asarray(cl),
        caxis=jnp.asarray(ax),
        tris=jnp.asarray(tr),
        leaf_size=cfg.leaf_size,
        num_nodes=w,
        max_depth=max(a.max_depth for a in accs),
    )


def _local_first_hit(recs: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray):
    """Nearest hit of each ray against ONE treelet's records.

    Returns (t, n, mat, fid): (R,), (R,3), (R,) i32, (R,) i32 — miss is
    (INF, 0, 0, -1). Brute-force MT batch; the normal is barycentrically
    interpolated from the record's vertex normals (smooth/flat pre-baked,
    reference renderer.cpp:124-149 semantics via build_face_table).
    """
    p0, e1, e2 = recs[:, 0:3], recs[:, 3:6], recs[:, 6:9]
    t, u, v, hit = moller_trumbore(
        o[:, None, :], d[:, None, :], p0[None], e1[None], e2[None]
    )  # (R, T)
    j = jnp.argmin(t, axis=1)
    rr = jnp.arange(t.shape[0])
    t_b = t[rr, j]
    found = t_b < INF
    row = recs[j]  # (R, 20)
    w0 = (1.0 - u[rr, j] - v[rr, j])[:, None]
    n = normalize(
        w0 * row[:, 9:12]
        + u[rr, j][:, None] * row[:, 12:15]
        + v[rr, j][:, None] * row[:, 15:18]
    )
    mat = jnp.where(found, row[:, 18].astype(jnp.int32), 0)
    fid = jnp.where(found, row[:, 19].astype(jnp.int32), -1)
    return t_b, jnp.where(found[:, None], n, 0.0), mat, fid


def _local_min_t(recs: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray):
    """Nearest-hit distance only (shadow-ray query) vs ONE treelet: (R,).
    Leaner than ``_local_first_hit`` — no normal interpolation, no record
    pickup; occlusion needs just t."""
    p0, e1, e2 = recs[:, 0:3], recs[:, 3:6], recs[:, 6:9]
    t, _, _, _ = moller_trumbore(
        o[:, None, :], d[:, None, :], p0[None], e1[None], e2[None]
    )
    return jnp.min(t, axis=1)


def _local_first_fid(recs: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray):
    """(t, fid) of the nearest hit vs ONE treelet — the lean discrete
    query for the differentiable path's first pass: no normal
    interpolation, no shading payload (those are replayed differentiably
    from the winning row afterwards)."""
    p0, e1, e2 = recs[:, 0:3], recs[:, 3:6], recs[:, 6:9]
    t, _, _, _ = moller_trumbore(
        o[:, None, :], d[:, None, :], p0[None], e1[None], e2[None]
    )  # (R, T)
    j = jnp.argmin(t, axis=1)
    rr = jnp.arange(t.shape[0])
    t_b = t[rr, j]
    fid = jnp.where(t_b < INF, recs[j, 19].astype(jnp.int32), -1)
    return t_b, fid


def ring_first_fid(
    recs_local: jnp.ndarray,   # (1, Tpad, 20) — THIS device's treelet
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    n_parts: int,
    axis_name: str = "rays",
):
    """Global (t, fid) via ``n_parts`` ring hops — the fid-only discrete
    ring for the differentiable path. Rotates only (o, d, t, fid): half
    the payload of ``ring_first_hit``, whose interpolated normals and
    material constants the diff path would immediately discard."""
    r = orig.shape[0]
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]
    state = (orig, dirn, jnp.full((r,), INF), jnp.full((r,), -1, jnp.int32))

    def hop(_, st):
        o, d, t_b, f_b = st
        t, fid = _local_first_fid(recs_local[0], o, d)
        upd = t < t_b
        st = (o, d, jnp.where(upd, t, t_b), jnp.where(upd, fid, f_b))
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), st
        )

    _, _, t_b, f_b = jax.lax.fori_loop(0, n_parts, hop, state)
    return t_b, f_b


def ring_occlusion_t(
    recs_local: jnp.ndarray,   # (1, Tpad, 20) — THIS device's treelet
    orig: jnp.ndarray,         # (R, 3) shadow rays
    dirn: jnp.ndarray,
    n_parts: int,
    axis_name: str = "rays",
):
    """Triangle-class nearest t via ``n_parts`` ring hops (inside
    shard_map) — the shadow-ray companion of ``ring_first_hit``; plugs
    into ``trace_radiance``'s ``occl_override`` seam so NEE works with
    geometry sharding."""
    r = orig.shape[0]
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]

    def hop(_, st):
        o, d, t_b = st
        t_b = jnp.minimum(t_b, _local_min_t(recs_local[0], o, d))
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), (o, d, t_b)
        )

    _, _, t_b = jax.lax.fori_loop(
        0, n_parts, hop, (orig, dirn, jnp.full((r,), INF))
    )
    return t_b


def ring_first_hit(
    recs_local: jnp.ndarray,   # (1, Tpad, 20) — THIS device's treelet
    orig: jnp.ndarray,         # (R, 3) local ray block
    dirn: jnp.ndarray,
    n_parts: int,
    axis_name: str = "rays",
):
    """Global nearest hit via ``n_parts`` ring hops (call INSIDE shard_map).

    Each hop tests the resident treelet, merges strictly-closer hits into
    the carried best record, then rotates (rays + best) one step around the
    ring; after a full cycle the state is home. Returns
    (t, normal, mat, hit, fid) for the local rays.
    """
    r = orig.shape[0]
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]
    state = (
        orig, dirn,
        jnp.full((r,), INF),
        jnp.zeros((r, 3)),
        jnp.zeros((r,), jnp.int32),
        jnp.full((r,), -1, jnp.int32),
    )

    def hop(_, st):
        o, d, t_b, n_b, m_b, f_b = st
        t, n, mat, fid = _local_first_hit(recs_local[0], o, d)
        upd = t < t_b
        st = (
            o, d,
            jnp.where(upd, t, t_b),
            jnp.where(upd[:, None], n, n_b),
            jnp.where(upd, mat, m_b),
            jnp.where(upd, fid, f_b),
        )
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), st
        )

    _, _, t_b, n_b, m_b, f_b = jax.lax.fori_loop(0, n_parts, hop, state)
    return t_b, n_b, m_b, f_b >= 0, f_b


def ring_first_hit_accel(
    ta: TreeletAccels,
    cb, cl, ax, tr,            # this device's table shards (leading axis 1)
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    alive: jnp.ndarray,        # (R,) f32 live mask (rides the ring)
    n_parts: int,
    axis_name: str = "rays",
    interpret: bool = False,
):
    """Kernel-backed global nearest hit: per hop, the resident treelet's
    fused wide-BVH kernel (kernels/wide_shade.py) answers the local query;
    the carried best record keeps (t, normal, material id, fid) — the id
    rides the ring instead of 7 material-constant planes (round 4: the
    kernel returns ``mat``; constants resolve at the home device from the
    replicated material table). Returns that tuple for the home rays
    after n_parts hops."""
    from atray_tpu.kernels.wide_shade import wide_shade_first_hit

    acc = ta.local(cb, cl, ax, tr)
    r = orig.shape[0]
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]
    state = (
        orig, dirn, alive,
        jnp.full((r,), INF),
        jnp.zeros((r, 3)),
        jnp.zeros((r,), jnp.int32),
        jnp.full((r,), -1, jnp.int32),
    )

    def hop(_, st):
        o, d, a, t_b, n_b, m_b, f_b = st
        fo = wide_shade_first_hit(acc, o, d, alive=a, interpret=interpret)
        upd = fo["t"] < t_b
        u1 = upd[:, None]
        st = (
            o, d, a,
            jnp.where(upd, fo["t"], t_b),
            jnp.where(u1, fo["normal"], n_b),
            jnp.where(upd, fo["mat"], m_b),
            jnp.where(upd, fo["id"], f_b),
        )
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), st
        )

    st = jax.lax.fori_loop(0, n_parts, hop, state)
    _, _, _, t_b, n_b, m_b, f_b = st
    return t_b, n_b, m_b, f_b


def ring_occlusion_t_accel(
    ta: TreeletAccels,
    cb, cl, ax, tr,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    live: jnp.ndarray,
    n_parts: int,
    axis_name: str = "rays",
    interpret: bool = False,
):
    """Shadow-ray companion of ``ring_first_hit_accel``: nearest t only."""
    from atray_tpu.kernels.wide_shade import wide_shade_first_hit

    acc = ta.local(cb, cl, ax, tr)
    r = orig.shape[0]
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]

    def hop(_, st):
        o, d, a, t_b = st
        t = wide_shade_first_hit(acc, o, d, alive=a, interpret=interpret)["t"]
        return jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm),
            (o, d, a, jnp.minimum(t_b, t)),
        )

    _, _, _, t_b = jax.lax.fori_loop(
        0, n_parts, hop, (orig, dirn, live, jnp.full((r,), INF))
    )
    return t_b


def render_treelet(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    key: jax.Array,
    mesh: Mesh,
    treelets: Optional[TreeletGeom] = None,
    axis_name: str = "rays",
    return_stats: bool = False,
):
    """Geometry-sharded forward render -> (H, W, 3) film.

    Mirrors ``wavefront.render`` (tile-ordered rays, spp average, clamp)
    but shards the TRIANGLES over the mesh instead of replicating them:
    per-bounce nearest-hit queries run as ppermute rings through
    ``trace_radiance``'s ``hit_override`` seam, so shading, PRNG
    discipline, compaction, and the rays-cast counter are the exact same
    code as the replicated path. Spheres/planes/materials are replicated
    (tiny). ``settings.ray_chunk`` is ignored (ray memory per device is
    already 1/n_devices). NEE runs its shadow rays through a second, leaner
    occlusion ring.

    ``treelets`` selects the local-query backend: a ``TreeletAccels``
    (from ``build_treelet_accels``) runs each hop through the fused
    wide-BVH Pallas kernel — the production path; a ``TreeletGeom`` (or
    None, the default) brute-forces Möller–Trumbore over the treelet's
    records — the oracle path; a ``TreeletParts`` rebuilds the record
    tables in-graph and is DIFFERENTIABLE w.r.t. the scene parameters
    (sharded-parameter path replay — inverse rendering at treelet scale).
    """
    n_dev = int(mesh.devices.size)
    if treelets is None:
        treelets = build_treelets(scene, n_dev)
    if treelets.num_parts != n_dev:
        raise ValueError(
            f"treelets built for {treelets.num_parts} parts, mesh has {n_dev}"
        )
    if isinstance(treelets, TreeletAccels):
        return _render_treelet_accel(
            scene, camera, settings, key, mesh, treelets, axis_name,
            return_stats,
        )
    if isinstance(treelets, TreeletShards):
        return _render_treelet_shards(
            scene, camera, settings, key, mesh, treelets, axis_name,
            return_stats,
        )
    if isinstance(treelets, TreeletParts):
        return _render_treelet_diff(
            scene, camera, settings, key, mesh, treelets, axis_name,
            return_stats,
        )

    w, h = settings.resolution
    spp = settings.samples_per_pixel
    aa_key, bounce_key = jax.random.split(key)
    orig, dirn = camera_rays(
        camera, w, h, spp,
        key=aa_key if settings.anti_aliasing else None,
        anti_aliasing=settings.anti_aliasing,
    )
    orig = to_tile_order(orig, w, h, spp)
    dirn = to_tile_order(dirn, w, h, spp)
    n = orig.shape[0]
    ray_ids = jnp.arange(n, dtype=jnp.int32)

    pad = (-n) % n_dev
    if pad:
        orig = jnp.concatenate([orig, jnp.full((pad, 3), 1.0e7, orig.dtype)])
        dirn = jnp.concatenate(
            [dirn, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dirn.dtype), (pad, 1))]
        )
        ray_ids = jnp.concatenate([ray_ids, n + jnp.arange(pad, dtype=jnp.int32)])

    # the sharded scene: triangles ride as the recs shard; the rest of the
    # scene (spheres/planes/materials + an EMPTY mesh) is replicated
    from atray_tpu.scene.data import empty_mesh

    lean = dataclasses.replace(scene, mesh=empty_mesh())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    def _run(o, d, ids, recs):
        def override(o_, d_, alive):
            o_ = jax.lax.stop_gradient(o_)
            d_ = jax.lax.stop_gradient(d_)
            t, nrm, mat, hit, _ = ring_first_hit(
                recs, o_, d_, n_parts=n_dev, axis_name=axis_name
            )
            return t, nrm, mat, hit

        def occl(o_, d_, live):
            return ring_occlusion_t(
                recs, o_, d_, n_parts=n_dev, axis_name=axis_name
            )

        color, stats = trace_radiance(
            lean, o, d, settings.bounce_limit, key=bounce_key,
            sort_rays=settings.sort_bounces, nee=settings.nee,
            return_stats=True, ray_ids=ids, hit_override=override,
            occl_override=occl,
        )
        return color, stats["rays_cast"][None]

    color, rc_shards = _run(orig, dirn, ray_ids, treelets.recs)
    color = color[:n]
    color = from_tile_order(color, w, h, spp)
    film = color.reshape(spp, h, w, 3).mean(axis=0)
    film = jnp.clip(film, 0.0, 1.0)
    if return_stats:
        return film, {
            "rays_cast": jnp.sum(rc_shards),
            "rays_cast_per_shard": rc_shards,
        }
    return film


def _render_treelet_diff(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    key: jax.Array,
    mesh: Mesh,
    parts: TreeletParts,
    axis_name: str,
    return_stats: bool,
):
    """Differentiable variant of ``render_treelet``: the record tables are
    a jnp function of the scene (``treelet_records``), the discrete ring
    answers WHICH face wins (detached), and each ray's continuous
    (t, normal, material) is replayed from its winning row fetched by the
    differentiable ``diff_row_pickup`` ring — so ``jax.grad`` through this
    render reaches vertices/normals/materials that are sharded over the
    device mesh and never resident on any single chip."""
    n_dev = int(mesh.devices.size)
    recs = treelet_records(scene, parts)           # in-graph: (P, Tpad, 20)

    w, h = settings.resolution
    spp = settings.samples_per_pixel
    aa_key, bounce_key = jax.random.split(key)
    orig, dirn = camera_rays(
        camera, w, h, spp,
        key=aa_key if settings.anti_aliasing else None,
        anti_aliasing=settings.anti_aliasing,
    )
    orig = to_tile_order(orig, w, h, spp)
    dirn = to_tile_order(dirn, w, h, spp)
    n = orig.shape[0]
    ray_ids = jnp.arange(n, dtype=jnp.int32)

    pad = (-n) % n_dev
    if pad:
        orig = jnp.concatenate([orig, jnp.full((pad, 3), 1.0e7, orig.dtype)])
        dirn = jnp.concatenate(
            [dirn, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dirn.dtype),
                            (pad, 1))]
        )
        ray_ids = jnp.concatenate(
            [ray_ids, n + jnp.arange(pad, dtype=jnp.int32)]
        )

    from atray_tpu.scene.data import empty_mesh

    lean = dataclasses.replace(scene, mesh=empty_mesh())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(None), P(None)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    def _run(o, d, ids, recs_l, owner, lrow):
        def override(o_, d_, alive):
            # discrete: which face wins (detached — visibility convention);
            # the fid-only ring rotates half the payload of ring_first_hit
            _, fid = ring_first_fid(
                jax.lax.stop_gradient(recs_l),
                jax.lax.stop_gradient(o_), jax.lax.stop_gradient(d_),
                n_parts=n_dev, axis_name=axis_name,
            )
            fid = jax.lax.stop_gradient(fid)
            # continuous: replay from the winning row (differentiable ring
            # gather — the sharded face-table row pickup)
            row = diff_row_pickup(
                recs_l, owner, lrow, fid, n_parts=n_dev, axis_name=axis_name
            )
            tt, u, v, _ = moller_trumbore(
                o_, d_, row[:, 0:3], row[:, 3:6], row[:, 6:9]
            )
            w0 = (1.0 - u - v)[:, None]
            nrm = normalize(
                w0 * row[:, 9:12]
                + u[:, None] * row[:, 12:15]
                + v[:, None] * row[:, 15:18]
            )
            mat = jax.lax.stop_gradient(row[:, 18]).astype(jnp.int32)
            # demote lanes whose replay missed (grazing-hit epsilon
            # disagreement) — keeping them "hit" would poison reverse
            # mode with INF * 0 (same guard as resolve_hit)
            hit = (fid >= 0) & (tt < 1.0e30)
            return (
                jnp.where(hit, tt, INF),
                jnp.where(hit[:, None], nrm, 0.0),
                jnp.where(hit, mat, 0),
                hit,
            )

        def occl(o_, d_, live):
            return ring_occlusion_t(
                jax.lax.stop_gradient(recs_l), o_, d_,
                n_parts=n_dev, axis_name=axis_name,
            )

        color, stats = trace_radiance(
            lean, o, d, settings.bounce_limit, key=bounce_key,
            sort_rays=settings.sort_bounces, nee=settings.nee,
            return_stats=True, ray_ids=ids, hit_override=override,
            occl_override=occl,
        )
        return color, stats["rays_cast"][None]

    color, rc_shards = _run(orig, dirn, ray_ids, recs, parts.owner, parts.lrow)
    color = color[:n]
    color = from_tile_order(color, w, h, spp)
    film = color.reshape(spp, h, w, 3).mean(axis=0)
    film = jnp.clip(film, 0.0, 1.0)
    if return_stats:
        return film, {
            "rays_cast": jnp.sum(rc_shards),
            "rays_cast_per_shard": rc_shards,
        }
    return film


def _render_treelet_shards(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    key: jax.Array,
    mesh: Mesh,
    shards: TreeletShards,
    axis_name: str,
    return_stats: bool,
):
    """Sharded-residency variant of ``render_treelet``: every geometry
    array arrives P-sharded over the mesh and the per-device record table
    is built INSIDE shard_map from the resident slices (``shard_records``)
    — no device holds another part's vertices, forward or backward.
    ``jax.grad`` w.r.t. ``shards.vertices``/``shards.normals`` yields
    per-copy cotangents on each shard; ``merge_vertex_grads`` reconciles
    duplicated boundary vertices with the replicated path's grads."""
    n_dev = int(mesh.devices.size)

    w, h = settings.resolution
    spp = settings.samples_per_pixel
    aa_key, bounce_key = jax.random.split(key)
    orig, dirn = camera_rays(
        camera, w, h, spp,
        key=aa_key if settings.anti_aliasing else None,
        anti_aliasing=settings.anti_aliasing,
    )
    orig = to_tile_order(orig, w, h, spp)
    dirn = to_tile_order(dirn, w, h, spp)
    n = orig.shape[0]
    ray_ids = jnp.arange(n, dtype=jnp.int32)

    pad = (-n) % n_dev
    if pad:
        orig = jnp.concatenate([orig, jnp.full((pad, 3), 1.0e7, orig.dtype)])
        dirn = jnp.concatenate(
            [dirn, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dirn.dtype),
                            (pad, 1))]
        )
        ray_ids = jnp.concatenate(
            [ray_ids, n + jnp.arange(pad, dtype=jnp.int32)]
        )

    from atray_tpu.scene.data import empty_mesh

    lean = dataclasses.replace(scene, mesh=empty_mesh())
    pp = P(axis_name)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pp, pp, pp, pp, pp, pp, pp, pp, pp, P(None), P(None)),
        out_specs=(pp, pp),
        check_vma=False,
    )
    def _run(o, d, ids, v_l, n_l, f_l, fn_l, mat_l, fid_l, owner, lrow):
        # THIS device's record table, built from its resident slices only
        recs_l = shard_records(
            v_l[0], n_l[0], f_l[0], fn_l[0], mat_l[0], fid_l[0]
        )[None]

        def override(o_, d_, alive):
            _, fid = ring_first_fid(
                jax.lax.stop_gradient(recs_l),
                jax.lax.stop_gradient(o_), jax.lax.stop_gradient(d_),
                n_parts=n_dev, axis_name=axis_name,
            )
            fid = jax.lax.stop_gradient(fid)
            row = diff_row_pickup(
                recs_l, owner, lrow, fid, n_parts=n_dev, axis_name=axis_name
            )
            tt, u, v, _ = moller_trumbore(
                o_, d_, row[:, 0:3], row[:, 3:6], row[:, 6:9]
            )
            w0 = (1.0 - u - v)[:, None]
            nrm = normalize(
                w0 * row[:, 9:12]
                + u[:, None] * row[:, 12:15]
                + v[:, None] * row[:, 15:18]
            )
            mat = jax.lax.stop_gradient(row[:, 18]).astype(jnp.int32)
            hit = (fid >= 0) & (tt < 1.0e30)
            return (
                jnp.where(hit, tt, INF),
                jnp.where(hit[:, None], nrm, 0.0),
                jnp.where(hit, mat, 0),
                hit,
            )

        def occl(o_, d_, live):
            return ring_occlusion_t(
                jax.lax.stop_gradient(recs_l), o_, d_,
                n_parts=n_dev, axis_name=axis_name,
            )

        color, stats = trace_radiance(
            lean, o, d, settings.bounce_limit, key=bounce_key,
            sort_rays=settings.sort_bounces, nee=settings.nee,
            return_stats=True, ray_ids=ids, hit_override=override,
            occl_override=occl,
        )
        return color, stats["rays_cast"][None]

    color, rc_shards = _run(
        orig, dirn, ray_ids,
        shards.vertices, shards.normals, shards.faces, shards.fnidx,
        shards.matid, shards.fid, shards.owner, shards.lrow,
    )
    color = color[:n]
    color = from_tile_order(color, w, h, spp)
    film = color.reshape(spp, h, w, 3).mean(axis=0)
    film = jnp.clip(film, 0.0, 1.0)
    if return_stats:
        return film, {
            "rays_cast": jnp.sum(rc_shards),
            "rays_cast_per_shard": rc_shards,
        }
    return film


def _render_treelet_accel(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    key: jax.Array,
    mesh: Mesh,
    ta: TreeletAccels,
    axis_name: str,
    return_stats: bool,
):
    """Kernel-backed variant of ``render_treelet``: the four wide-BVH
    tables shard over the mesh on their leading parts axis; each ring hop
    runs the fused Pallas traversal on the resident treelet."""
    from atray_tpu.render.wavefront import _pallas_interpret

    n_dev = int(mesh.devices.size)
    interpret = _pallas_interpret()

    w, h = settings.resolution
    spp = settings.samples_per_pixel
    aa_key, bounce_key = jax.random.split(key)
    orig, dirn = camera_rays(
        camera, w, h, spp,
        key=aa_key if settings.anti_aliasing else None,
        anti_aliasing=settings.anti_aliasing,
    )
    orig = to_tile_order(orig, w, h, spp)
    dirn = to_tile_order(dirn, w, h, spp)
    n = orig.shape[0]
    ray_ids = jnp.arange(n, dtype=jnp.int32)

    pad = (-n) % n_dev
    if pad:
        orig = jnp.concatenate([orig, jnp.full((pad, 3), 1.0e7, orig.dtype)])
        dirn = jnp.concatenate(
            [dirn, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dirn.dtype),
                            (pad, 1))]
        )
        ray_ids = jnp.concatenate(
            [ray_ids, n + jnp.arange(pad, dtype=jnp.int32)]
        )

    from atray_tpu.scene.data import empty_mesh

    lean = dataclasses.replace(scene, mesh=empty_mesh())
    rayspec = P(axis_name)
    partspec = P(axis_name)   # leading parts axis sharded over same devices

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rayspec, rayspec, rayspec,
                  partspec, partspec, partspec, partspec),
        out_specs=(rayspec, rayspec),
        check_vma=False,
    )
    def _run(o, d, ids, cb, cl, ax, tr):
        def override(o_, d_, alive):
            from atray_tpu.render.wavefront import resolve_material_rows

            o_ = jax.lax.stop_gradient(o_)
            d_ = jax.lax.stop_gradient(d_)
            t, nrm, mat, fid = ring_first_hit_accel(
                ta, cb, cl, ax, tr, o_, d_,
                alive.astype(jnp.float32), n_parts=n_dev,
                axis_name=axis_name, interpret=interpret,
            )
            # only the material ID rode the ring; constants resolve here
            # from the replicated material table
            em_r, al_r, sc_r = resolve_material_rows(lean, mat, fid >= 0)
            return t, nrm, em_r, al_r, sc_r, fid >= 0

        def occl(o_, d_, live):
            return ring_occlusion_t_accel(
                ta, cb, cl, ax, tr, o_, d_,
                live.astype(jnp.float32), n_parts=n_dev,
                axis_name=axis_name, interpret=interpret,
            )

        color, stats = trace_radiance(
            lean, o, d, settings.bounce_limit, key=bounce_key,
            sort_rays=settings.sort_bounces, nee=settings.nee,
            return_stats=True, ray_ids=ids, hit_override=override,
            occl_override=occl,
        )
        return color, stats["rays_cast"][None]

    color, rc_shards = _run(
        orig, dirn, ray_ids, ta.cboxes, ta.clinks, ta.caxis, ta.tris
    )
    color = color[:n]
    color = from_tile_order(color, w, h, spp)
    film = color.reshape(spp, h, w, 3).mean(axis=0)
    film = jnp.clip(film, 0.0, 1.0)
    if return_stats:
        return film, {
            "rays_cast": jnp.sum(rc_shards),
            "rays_cast_per_shard": rc_shards,
        }
    return film
