"""Wavefront path tracer: the TPU-native forward pass.

Re-design of the reference's per-pixel recursive/iterative ``cast_ray``
(renderer.cpp:213-262) and tile scheduler (renderer.cpp:264-471): instead of
8 CPU threads pulling tiles off an atomic queue, ALL rays advance together
through a ``lax.scan`` over bounces — intersect, resolve, shade, respawn —
with masking for terminated paths. Tiling/sharding happens a level up
(atray_tpu/dist) by slicing the flat ray axis over the device mesh.

Differentiation seam (the architecture's key decision): the *discrete* part
of intersection (which primitive is nearest) is isolated in
``nearest_hit_ids`` and treated as non-differentiable — it may be brute
force, BVH traversal, or a Pallas kernel. The *continuous* part
(``resolve_hit``: t, barycentrics, normal recomputed from the chosen
primitive id) is differentiable w.r.t. vertices/normals, and shading is
differentiable w.r.t. materials. Gradients therefore follow the
detached-visibility convention (no derivative through silhouette changes),
which the CPU oracle (tests/oracle.py) mirrors exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from atray_tpu.config import RenderSettings
from atray_tpu.core.camera import Camera, camera_rays
from atray_tpu.core.intersect import (
    INF,
    dot,
    first_triangle_hit,
    moller_trumbore,
    normalize,
    plane_hits,
    reflect,
    sphere_hits,
)
from atray_tpu.scene.data import Scene

# Primitive type codes in hit records (reference IntersectionData.type,
# renderer.cpp:12-25).
PRIM_NONE = 0
PRIM_TRI = 1
PRIM_SPHERE = 2
PRIM_PLANE = 3


def _pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU test harness).
    The TPU platform may be named 'tpu' or (here) the experimental 'axon'."""
    return jax.default_backend() == "cpu"


class HitIds(NamedTuple):
    """Discrete outcome of a nearest-hit query. ``t`` is carried for
    diagnostics/compaction but is recomputed differentiably by
    ``resolve_hit``."""

    prim_type: jnp.ndarray  # (R,) i32 in {NONE, TRI, SPHERE, PLANE}
    prim_id: jnp.ndarray    # (R,) i32 index within its class (-1 if none)
    t: jnp.ndarray          # (R,) f32 (INF on miss) — non-differentiable


def nearest_hit_ids(
    scene: Scene,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    accel=None,
) -> HitIds:
    """Nearest primitive per ray across all classes.

    Equivalent of the reference's get_intersection_data dispatch
    (renderer.cpp:34-107): triangles (brute force here; BVH when ``accel``
    is given), then spheres, then planes, keeping the global minimum t.
    Entirely non-differentiable by intent (wrapped in stop_gradient).
    """
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    orig = jax.lax.stop_gradient(orig)
    dirn = jax.lax.stop_gradient(dirn)
    r = orig.shape[0]
    best_t = jnp.full((r,), INF)
    best_type = jnp.zeros((r,), jnp.int32)
    best_id = jnp.full((r,), -1, jnp.int32)

    if scene.mesh.num_faces > 0:
        if accel is not None:
            from atray_tpu.accel.bvh import BVH
            from atray_tpu.accel.traverse import bvh_first_hit
            from atray_tpu.accel.wide import WideBVH
            from atray_tpu.kernels.traverse_pallas import TreePack

            if isinstance(accel, TreePack):
                # persistent packet kernel: exact per-ray culling, best for
                # incoherent (bounce) rays; tables stay on chip
                from atray_tpu.kernels.persistent_packet import (
                    ppacket_first_hit,
                )

                t, _, _, tid = ppacket_first_hit(
                    accel, orig, dirn, interpret=_pallas_interpret()
                )
            elif isinstance(accel, WideBVH):
                # persistent exact wide kernel; the interleaved variant
                # trades a little coherent speed for faster bounce rays
                if accel.variant == "exact2":
                    from atray_tpu.kernels.wide_exact2 import (
                        wide_exact2_first_hit as _hit,
                    )
                else:
                    from atray_tpu.kernels.wide_exact import (
                        wide_exact_first_hit as _hit,
                    )

                t, _, _, tid = _hit(
                    accel, orig, dirn, interpret=_pallas_interpret()
                )
            elif isinstance(accel, BVH):
                t, _, _, tid = bvh_first_hit(accel, scene, orig, dirn)
            else:
                raise TypeError(f"unknown accel type {type(accel)!r}")
        else:
            p0, e1, e2 = scene.triangle_soa()
            t, _, _, tid = first_triangle_hit(orig, dirn, p0, e1, e2)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_type = jnp.where(closer, PRIM_TRI, best_type)
        best_id = jnp.where(closer, tid, best_id)

    if scene.spheres.count > 0:
        t, sid = sphere_hits(orig, dirn, scene.spheres.centers, scene.spheres.radii)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_type = jnp.where(closer, PRIM_SPHERE, best_type)
        best_id = jnp.where(closer, sid, best_id)

    if scene.planes.count > 0:
        t, pid = plane_hits(orig, dirn, scene.planes.normals, scene.planes.offsets)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_type = jnp.where(closer, PRIM_PLANE, best_type)
        best_id = jnp.where(closer, pid, best_id)

    best_type = jax.lax.stop_gradient(best_type)
    best_id = jax.lax.stop_gradient(best_id)
    best_t = jax.lax.stop_gradient(best_t)
    return HitIds(best_type, best_id, best_t)


def build_face_table(scene: Scene) -> Optional[jnp.ndarray]:
    """(T, 20) packed per-face shading table, built ONCE per trace:
    [p0(3), e1(3), e2(3), n0(3), n1(3), n2(3), material_id, pad]. Faces
    without smooth normals get the flat (geometric) normal in all three
    slots, so per-ray resolution needs no branch. Material id is stored as
    an exact f32 value (ids < 2^24).

    Why: resolve_hit previously performed ~8 scattered row gathers per ray
    per bounce (faces, three vertices, three normals, ids) — at 1M rays
    that XLA gather traffic cost ~130 ms per bounce on v5e, dominating the
    frame. Building the table is ONE pass over T faces; per bounce there is
    then a single contiguous (R, 20)-row gather. Gradients still flow to
    vertices and normals through the table construction.
    """
    if scene.mesh.num_faces == 0:
        return None
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    v = scene.mesh.vertices
    f = scene.mesh.faces
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    flat_n = normalize(jnp.cross(e1, e2))
    nidx = scene.mesh.face_normal_idx
    has_smooth = (nidx[:, 0] >= 0)[:, None]
    ncl = jnp.clip(nidx, 0, scene.mesh.normals.shape[0] - 1)
    n0 = jnp.where(has_smooth, scene.mesh.normals[ncl[:, 0]], flat_n)
    n1 = jnp.where(has_smooth, scene.mesh.normals[ncl[:, 1]], flat_n)
    n2 = jnp.where(has_smooth, scene.mesh.normals[ncl[:, 2]], flat_n)
    mat = scene.mesh.material_id.astype(jnp.float32)[:, None]
    return jnp.concatenate(
        [p0, e1, e2, n0, n1, n2, mat, jnp.zeros_like(mat)], axis=1
    )  # (T, 20)


def resolve_hit(
    scene: Scene,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    ids: HitIds,
    face_table: Optional[jnp.ndarray] = None,
):
    """Differentiable recompute of the hit from its discrete ids.

    Returns (t, shading_normal, material_id, hit_mask). The shading normal is
    geometric-flat or smooth-interpolated for triangles (reference
    renderer.cpp:110-149); gradients flow to vertices (via Möller–Trumbore
    partials) and vertex normals. Pass ``face_table`` (build_face_table) to
    replace the 8 scattered gathers with one packed row gather.
    """
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    r = orig.shape[0]
    t = jnp.full((r,), INF)
    normal = jnp.zeros((r, 3))
    mat = jnp.zeros((r,), jnp.int32)  # 0 = skybox

    is_tri = ids.prim_type == PRIM_TRI
    is_sph = ids.prim_type == PRIM_SPHERE
    is_pln = ids.prim_type == PRIM_PLANE

    if scene.mesh.num_faces > 0:
        fid = jnp.clip(ids.prim_id, 0, scene.mesh.num_faces - 1)
        if face_table is None:
            face_table = build_face_table(scene)
        row = face_table[fid]                          # (R, 20): one gather
        p0 = row[:, 0:3]
        e1 = row[:, 3:6]
        e2 = row[:, 6:9]
        n0 = row[:, 9:12]
        n1 = row[:, 12:15]
        n2 = row[:, 15:18]
        tt, u, vv, _ = moller_trumbore(orig, dirn, p0, e1, e2)
        w0 = (1.0 - u - vv)[:, None]
        tri_n = normalize(w0 * n0 + u[:, None] * n1 + vv[:, None] * n2)
        t = jnp.where(is_tri, tt, t)
        normal = jnp.where(is_tri[:, None], tri_n, normal)
        mat = jnp.where(is_tri, row[:, 18].astype(jnp.int32), mat)

    if scene.spheres.count > 0:
        sid = jnp.clip(ids.prim_id, 0, scene.spheres.count - 1)
        c = scene.spheres.centers[sid]
        rad = scene.spheres.radii[sid]
        oc = orig - c
        b = dot(oc, dirn)
        csq = dot(oc, oc) - rad * rad
        disc = jnp.maximum(b * b - csq, 0.0)
        sq = jnp.sqrt(disc)
        t0 = -b - sq
        t1 = -b + sq
        ts = jnp.where(t0 > 1e-4, t0, t1)
        sph_n = normalize(orig + ts[:, None] * dirn - c)
        t = jnp.where(is_sph, ts, t)
        normal = jnp.where(is_sph[:, None], sph_n, normal)
        mat = jnp.where(is_sph, scene.spheres.material_id[sid], mat)

    if scene.planes.count > 0:
        pid = jnp.clip(ids.prim_id, 0, scene.planes.count - 1)
        pn = scene.planes.normals[pid]
        po = scene.planes.offsets[pid]
        denom = dot(dirn, pn)
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        tp = (po - dot(orig, pn)) / safe
        t = jnp.where(is_pln, tp, t)
        normal = jnp.where(is_pln[:, None], pn, normal)
        mat = jnp.where(is_pln, scene.planes.material_id[pid], mat)

    hit = ids.prim_type != PRIM_NONE
    return t, normal, jnp.where(hit, mat, 0), hit


def _bounce_dir(
    dirn: jnp.ndarray,
    normal: jnp.ndarray,
    scatter: jnp.ndarray,   # (R,)
    uni: jnp.ndarray,       # (R, 3) uniforms in [-1, 1]
) -> jnp.ndarray:
    """Next-bounce direction: lerp(diffuse_jitter, mirror, scatter).

    Reference renderer.cpp:240-248: ``random_bounce`` = normalize(normal +
    uniform-cube jitter), ``pure_bounce`` = mirror reflection; blend by the
    material's scatter. (Not cosine-importance sampling — capability parity
    with the reference's BRDF model; the oracle shares the convention.)
    """
    random_bounce = normalize(normal + uni)
    pure_bounce = reflect(dirn, normal)
    return normalize(
        random_bounce + (pure_bounce - random_bounce) * scatter[:, None]
    )


def trace_radiance(
    scene: Scene,
    orig: jnp.ndarray,         # (R, 3)
    dirn: jnp.ndarray,         # (R, 3) unit
    bounce_limit: int,
    key: Optional[jax.Array] = None,
    uniforms: Optional[jnp.ndarray] = None,   # (B, R, 3) in [-1, 1]
    accel=None,
    sort_rays: bool = False,
    nee: bool = False,
    return_stats: bool = False,
):
    """Path-trace each ray to its radiance (R, 3).

    ``nee=True`` adds next-event estimation: at every live hit one sphere
    light is picked uniformly, a uniform point on it is sampled, and a
    shadow ray adds ``weight * albedo * light_emission * cos * r^2/d^2 *
    n_lights`` when unoccluded; hit emission then only counts on the
    camera bounce (no double counting). Needs 6 uniform channels per
    bounce (3 jitter + light pick + 2 sphere-point).


    The bounce loop is a ``lax.scan`` (reference hot loop 3,
    renderer.cpp:222-259). Stochastic bounce jitter comes either from
    ``uniforms`` (explicit, for oracle comparison) or is drawn per bounce
    from ``fold_in(key, bounce)`` — both paths produce identical numbers for
    the same key (see ``draw_bounce_uniforms``).

    Shading convention (shared with tests/oracle.py):
    - miss -> color += weight * emission[material 0], terminate;
    - hit  -> attenuation = dot(-d, n), but 0 if the normal had to be
      flipped (backface) — reference renderer.cpp:233-238;
      color += weight * emission[m]; weight *= albedo[m] * attenuation.
    """
    r = orig.shape[0]
    if uniforms is None and key is None:
        raise ValueError("need key or uniforms for stochastic bounces")

    # scene leaves are host numpy by construction (see scene/data._f32);
    # promote them here so closed-over scenes become on-device constants
    # (a numpy leaf indexed by a traced id would fail)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)

    em = scene.materials.emission
    al = scene.materials.albedo
    sc = scene.materials.scatter
    sky = em[0]

    # A HybridAccel splits the accelerator by coherence: the primary bounce
    # (coherent film tiles) uses the wide/persistent kernel, later bounces
    # (scattered directions) use the exact-culling packet kernel. The first
    # bounce is peeled out of the scan so this dispatch is static.
    from atray_tpu.accel.wide import HybridAccel, WideBVH

    if isinstance(accel, HybridAccel):
        primary_accel, bounce_accel = accel.wide, accel.pack
    elif isinstance(accel, WideBVH) and accel.variant == "exact":
        # same tables, different kernel: interleaved walk for the
        # incoherent bounces (~25% faster), single-block for primaries
        primary_accel = accel
        bounce_accel = dataclasses.replace(accel, variant="exact2")
    else:
        primary_accel = bounce_accel = accel

    # Per-bounce jitter: explicit ``uniforms`` ride in as scan xs (oracle
    # path); otherwise drawn per bounce from fold_in(key, b) — bit-identical
    # to draw_bounce_uniforms(key, ...) for the same key, without ever
    # materializing the (B, R, 3) tensor (8 GB at 1080p/64spp/5 bounces).
    face_table = build_face_table(scene)

    nee_active = nee and scene.spheres.count > 0
    nchan = 6 if nee_active else 3

    from atray_tpu.accel.shaded import ShadedWideBVH

    def _onehot_rows(idx, table):
        """Gather-free row pickup for SMALL tables: one-hot (R, K) matmul
        against (K, C) — rides the MXU instead of the slow gather path."""
        k = table.shape[0]
        oh = (idx[:, None] == jnp.arange(k)[None, :]).astype(table.dtype)
        return oh @ table

    def _hit_inputs(o, d, accel_):
        """(t, n, hit, em_ray, al_ray, sc_ray, aux) for the nearest hit.

        Standard path: discrete ids + differentiable resolve + material
        gathers. Fused path (ShadedWideBVH): the traversal kernel already
        returns normal and material constants — zero per-ray gathers;
        sphere/plane lanes are patched in with one-hot matmuls.
        ``aux`` carries (sphere_mask, sphere_id) for NEE occlusion tests.
        """
        if isinstance(accel_, ShadedWideBVH):
            from atray_tpu.kernels.wide_shade import wide_shade_first_hit

            fo = wide_shade_first_hit(
                accel_, jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
                interpret=_pallas_interpret(),
            )
            t = fo["t"]
            n = fo["normal"]
            em_ray = fo["emission"]
            al_ray = fo["albedo"]
            sc_ray = fo["scatter"]
            hit = fo["id"] >= 0
            sph_mask = jnp.zeros((r,), bool)
            sph_id = jnp.full((r,), -1, jnp.int32)
            if scene.spheres.count > 0:
                ts, sid = sphere_hits(
                    o, d, scene.spheres.centers, scene.spheres.radii
                )
                closer = ts < t
                p = o + ts[:, None] * d
                c_rows = _onehot_rows(sid, scene.spheres.centers)
                n_s = normalize(p - c_rows)
                mat_s = _onehot_rows(
                    sid, scene.spheres.material_id[:, None].astype(jnp.float32)
                )[:, 0].astype(jnp.int32)
                t = jnp.where(closer, ts, t)
                n = jnp.where(closer[:, None], n_s, n)
                em_ray = jnp.where(closer[:, None], _onehot_rows(mat_s, em), em_ray)
                al_ray = jnp.where(closer[:, None], _onehot_rows(mat_s, al), al_ray)
                sc_ray = jnp.where(
                    closer, _onehot_rows(mat_s, sc[:, None])[:, 0], sc_ray
                )
                hit = hit | (closer & (sid >= 0))
                sph_mask = closer & (sid >= 0)
                sph_id = jnp.where(sph_mask, sid, -1)
            if scene.planes.count > 0:
                tp, pid = plane_hits(
                    o, d, scene.planes.normals, scene.planes.offsets
                )
                closer = tp < t
                n_p = _onehot_rows(pid, scene.planes.normals)
                mat_p = _onehot_rows(
                    pid, scene.planes.material_id[:, None].astype(jnp.float32)
                )[:, 0].astype(jnp.int32)
                t = jnp.where(closer, tp, t)
                n = jnp.where(closer[:, None], n_p, n)
                em_ray = jnp.where(closer[:, None], _onehot_rows(mat_p, em), em_ray)
                al_ray = jnp.where(closer[:, None], _onehot_rows(mat_p, al), al_ray)
                sc_ray = jnp.where(
                    closer, _onehot_rows(mat_p, sc[:, None])[:, 0], sc_ray
                )
                hit = hit | (closer & (pid >= 0))
                sph_mask = sph_mask & ~closer
                sph_id = jnp.where(sph_mask, sph_id, -1)
            return t, n, hit, em_ray, al_ray, sc_ray, (sph_mask, sph_id)

        ids = nearest_hit_ids(scene, o, d, accel=accel_)
        t, n, mat, hit = resolve_hit(scene, o, d, ids, face_table=face_table)
        sph_mask = ids.prim_type == PRIM_SPHERE
        return (
            t, n, hit, em[mat], al[mat], sc[mat],
            (sph_mask, jnp.where(sph_mask, ids.prim_id, -1)),
        )

    def _occlusion(o, d, accel_, dist, lid):
        """True where something other than the picked light blocks the
        shadow ray before ``dist``."""
        if isinstance(accel_, ShadedWideBVH):
            from atray_tpu.kernels.wide_shade import wide_shade_first_hit

            t = wide_shade_first_hit(
                accel_, o, d, interpret=_pallas_interpret()
            )["t"]
            is_light = jnp.zeros_like(lid, dtype=bool)
            if scene.spheres.count > 0:
                ts, sid = sphere_hits(
                    o, d, scene.spheres.centers, scene.spheres.radii
                )
                is_light = (ts < t) & (sid == lid)
                t = jnp.minimum(t, ts)
            if scene.planes.count > 0:
                tp, _ = plane_hits(
                    o, d, scene.planes.normals, scene.planes.offsets
                )
                is_light = is_light & ~(tp < t)
                t = jnp.minimum(t, tp)
            return (t < dist - 1.0e-3) & (~is_light)
        sids = nearest_hit_ids(scene, o, d, accel=accel_)
        is_light = (sids.prim_type == PRIM_SPHERE) & (sids.prim_id == lid)
        return (sids.t < dist - 1.0e-3) & (~is_light)

    def body_with(state, xs, accel_, first_bounce):
        if uniforms is not None:
            _, uni = xs
        else:
            b = xs
            uni = jax.random.uniform(
                jax.random.fold_in(key, b), (r, nchan), jnp.float32, -1.0, 1.0
            )
        o, d, weight, color, alive = state
        t, n, hit, em_ray, al_ray, sc_ray, _aux = _hit_inputs(o, d, accel_)

        miss_now = alive & ~hit
        color = color + jnp.where(miss_now[:, None], weight * sky, 0.0)

        live_hit = alive & hit
        cos_in = dot(-d, n)
        backface = cos_in < 0.0
        n_o = jnp.where(backface[:, None], -n, n)
        atten = jnp.where(backface, 0.0, cos_in)

        # Emitters: with NEE their light arrives via shadow rays, so hit
        # emission is only added on the camera bounce (else every light
        # would be counted twice).
        if (not nee_active) or first_bounce:
            color = color + jnp.where(live_hit[:, None], weight * em_ray, 0.0)

        # t is INF on misses; zero it before use so the untaken where-branch
        # stays finite (INF * 0 -> NaN would poison reverse-mode grads).
        t_safe = jnp.where(hit, t, 0.0)
        hit_p = o + t_safe[:, None] * d

        if nee_active:
            # --- next-event estimation (shadow rays to sphere lights) ----
            ns = scene.spheres.count
            u_pick = (uni[:, 3] + 1.0) * 0.5                 # [0, 1)
            lid = jnp.minimum((u_pick * ns).astype(jnp.int32), ns - 1)
            lc = scene.spheres.centers[lid]
            lr = scene.spheres.radii[lid]
            lem = em[scene.spheres.material_id[lid]]
            # uniform point on the light sphere from 2 uniforms
            z = uni[:, 4]                                     # [-1, 1]
            phi = (uni[:, 5] + 1.0) * jnp.pi                  # [0, 2pi)
            s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
            sp = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=1)
            target = lc + lr[:, None] * sp
            delta = target - hit_p
            dist = jnp.sqrt(jnp.maximum(dot(delta, delta), 1.0e-12))
            ldir = delta / dist[:, None]
            cos_l = jnp.maximum(dot(n_o, ldir), 0.0)
            # occlusion: nearest hit along the shadow ray closer than the
            # light sample point (minus eps to ignore the light's own
            # surface); dead lanes get parked rays
            so = jnp.where(live_hit[:, None], hit_p, 1.0e7)
            sd = jnp.where(live_hit[:, None], ldir, jnp.asarray([0.0, 0.0, 1.0]))
            occluded = _occlusion(so, sd, accel_, dist, lid)
            geom = (lr * lr) / jnp.maximum(dist * dist, lr * lr)
            direct = (
                weight
                * al_ray
                * lem
                * (cos_l * geom * ns)[:, None]
            )
            color = color + jnp.where(
                (live_hit & ~occluded)[:, None], direct, 0.0
            )

        weight = jnp.where(
            live_hit[:, None], weight * al_ray * atten[:, None], weight
        )

        new_d = _bounce_dir(d, n_o, sc_ray, uni[:, 0:3])
        o = jnp.where(live_hit[:, None], hit_p, o)
        d = jnp.where(live_hit[:, None], new_d, d)
        alive = live_hit
        return (o, d, weight, color, alive), None

    def sort_key(o, d, alive):
        """Compaction key: dead rays last; live rays grouped by direction
        octant then coarse spatial cell — restores packet coherence for
        bounce rays (the wavefront analog of the reference's per-ray
        early-break, SURVEY.md §5.7)."""
        v = scene.mesh.vertices
        lo = jnp.min(v, axis=0)
        hi = jnp.max(v, axis=0)
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 31.0).astype(jnp.int32)
        octant = (
            (d[:, 0] > 0).astype(jnp.int32)
            + 2 * (d[:, 1] > 0).astype(jnp.int32)
            + 4 * (d[:, 2] > 0).astype(jnp.int32)
        )
        key = (octant << 15) | (cell[:, 0] << 10) | (cell[:, 1] << 5) | cell[:, 2]
        return jnp.where(alive, key, jnp.int32(1) << 30)

    ridx = jnp.arange(r)
    state = (
        orig,
        dirn,
        jnp.ones((r, 3)),
        jnp.zeros((r, 3)),
        jnp.ones((r,), bool),
    )

    # total rays actually cast = sum over bounces of live paths entering the
    # bounce (the reference's RenderTile.ray_casts counter,
    # renderer.cpp:345,355,465-468) — here a reduction, not an atomic.
    rays_cast = jnp.int64(0) if False else jnp.float32(0.0)

    for b in range(bounce_limit):
        accel_b = primary_accel if b == 0 else bounce_accel
        if uniforms is not None:
            xs = (jnp.int32(b), uniforms[b][ridx])
        else:
            xs = jnp.int32(b)
        rays_cast = rays_cast + jnp.sum(state[4].astype(jnp.float32))
        state, _ = body_with(state, xs, accel_b, first_bounce=(b == 0))
        if sort_rays and b < bounce_limit - 1:
            o, d, weight, color, alive = state
            perm = jnp.argsort(sort_key(o, d, alive))
            # park dead rays far outside the scene so all-dead packet
            # blocks reject at the BVH root in one step
            o = jnp.where(alive[:, None], o, 1.0e7)
            d = jnp.where(alive[:, None], d, jnp.asarray([0.0, 0.0, 1.0]))
            state = (
                o[perm], d[perm], weight[perm], color[perm], alive[perm]
            )
            ridx = ridx[perm]

    color = state[3]
    if sort_rays:
        color = jnp.zeros_like(color).at[ridx].set(color)
    if return_stats:
        return color, {"rays_cast": rays_cast}
    return color


def draw_bounce_uniforms(
    key: jax.Array, bounces: int, num_rays: int, channels: int = 3
) -> jnp.ndarray:
    """(B, R, channels) uniforms in [-1, 1], bounce b from fold_in(key, b).
    3 channels for plain path tracing; 6 when NEE is on.

    Exported so the CPU oracle can consume the exact numbers the device
    path uses (counter-based keys replace the reference's per-thread
    rdtsc*tid seeding, pl_utils_win32.cpp:10-15 — bit-reproducible runs).
    """
    return jnp.stack(
        [
            jax.random.uniform(
                jax.random.fold_in(key, b), (num_rays, channels),
                jnp.float32, -1.0, 1.0,
            )
            for b in range(bounces)
        ]
    )


def _largest_divisor_leq(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def film_tile_shape(width: int, height: int) -> Tuple[int, int]:
    """(tile_h, tile_w) dividing the film, near the Pallas ray-block
    footprint (8 sublanes x 128 lanes) so consecutive rays share a compact
    2D frustum — the SPMD analog of the reference's square tiles
    (renderer.cpp:406-411)."""
    return _largest_divisor_leq(height, 16), _largest_divisor_leq(width, 128)


def to_tile_order(x: jnp.ndarray, w: int, h: int, spp: int) -> jnp.ndarray:
    """(spp*h*w, C) sample-major rays -> film-tile-major order.

    Pure reshape/transpose (no gather). Samples of the same tile stay
    adjacent across spp so packet blocks see a compact pixel footprint.
    """
    th, tw = film_tile_shape(w, h)
    c = x.shape[-1]
    t = x.reshape(spp, h // th, th, w // tw, tw, c)
    return t.transpose(1, 3, 0, 2, 4, 5).reshape(-1, c)


def from_tile_order(x: jnp.ndarray, w: int, h: int, spp: int) -> jnp.ndarray:
    """Inverse of to_tile_order."""
    th, tw = film_tile_shape(w, h)
    c = x.shape[-1]
    t = x.reshape(h // th, w // tw, spp, th, tw, c)
    return t.transpose(2, 0, 3, 1, 4, 5).reshape(-1, c)


def render(
    scene: Scene,
    camera: Camera,
    settings: RenderSettings,
    key: jax.Array,
    accel=None,
    uniforms: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full forward render -> linear-RGB film (H, W, 3) in [0, 1].

    Equivalent of the reference's start_render_from_camera + per-tile loops
    (renderer.cpp:294-366): camera-ray generation with optional AA jitter,
    spp averaging, clamp. Output is linear (the reference's sRGB conversion
    is commented out, renderer.cpp:361-362; use film.linear_to_srgb).

    Rays are traced in film-tile order (coherent packets for the Pallas
    traversal) and restored to film order for the average. When
    ``settings.ray_chunk`` > 0, rays are processed in chunks of that many
    by a host loop — bounding device memory and single-dispatch runtime
    (long single XLA programs can exceed RPC deadlines).
    """
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
    if uniforms is not None:
        uniforms = jax.vmap(
            lambda u: to_tile_order(u, w, h, spp)
        )(uniforms)

    n = orig.shape[0]
    chunk = settings.ray_chunk
    if chunk and chunk < n:
        pieces = []
        nchunks = -(-n // chunk)
        for i in range(nchunks):
            sl = slice(i * chunk, min((i + 1) * chunk, n))
            pieces.append(
                trace_radiance(
                    scene, orig[sl], dirn[sl], settings.bounce_limit,
                    key=jax.random.fold_in(bounce_key, i),
                    uniforms=None if uniforms is None else uniforms[:, sl],
                    accel=accel, sort_rays=settings.sort_bounces,
                    nee=settings.nee,
                )
            )
        color = jnp.concatenate(pieces, axis=0)
    else:
        color = trace_radiance(
            scene, orig, dirn, settings.bounce_limit,
            key=bounce_key, uniforms=uniforms, accel=accel,
            sort_rays=settings.sort_bounces, nee=settings.nee,
        )
    color = from_tile_order(color, w, h, spp)
    film = color.reshape(spp, h, w, 3).mean(axis=0)
    return jnp.clip(film, 0.0, 1.0)
