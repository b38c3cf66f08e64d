"""Pair-binned traversal (kernels/treelet_pairs.py) vs the production
wide_shade kernel: the two exact mechanisms must agree on every ray.

Winning hits go through IDENTICAL Möller–Trumbore ops in both kernels,
so (t, id, normal, mat) compare with exact equality, not tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atray_tpu.accel.shaded import build_shaded_accel
from atray_tpu.config import KDTreeConfig
from atray_tpu.kernels.treelet_pairs import (
    treelet_candidates,
    treelet_pair_hit,
)
from atray_tpu.kernels.wide_shade import wide_shade_planes
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import make_materials
from atray_tpu.scene.transforms import translate

MATS = make_materials([
    ((0.3, 0.4, 0.6), (0.0, 0.0, 0.0), 0.0),
    ((0.0, 0.0, 0.0), (0.7, 0.6, 0.5), 0.1),
])


def _accel(tris=3000, lpt=4, leaf=16):
    mesh = translate(
        procedural.dragon_proxy(target_tris=tris, material=1),
        (0.0, 0.0, -4.0),
    )
    scene = build_scene([mesh], materials=MATS)
    return build_shaded_accel(
        scene, KDTreeConfig(leaf_size=leaf, leaves_per_treelet=lpt)
    )


def _rays(n, kind, rng):
    if kind == "hemisphere":
        # bounce-like: origins near the surface shell, random directions
        o = rng.normal(size=(n, 3)) * 0.8 + [0, 0, -4]
        d = rng.normal(size=(n, 3))
    else:
        # camera-like: one origin, directions at the mesh
        o = np.tile([0.0, 0.5, 0.5], (n, 1)) + rng.normal(size=(n, 3)) * 0.02
        d = np.asarray([0, -0.1, -1.0]) + rng.normal(size=(n, 3)) * 0.35
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


@pytest.mark.parametrize("kind,lpt",
                         [("camera", 4), ("hemisphere", 2)])
@pytest.mark.slow
def test_pair_hit_matches_wide_shade(kind, lpt, rng):
    accel = _accel(tris=2500, lpt=lpt)
    n = 2048
    o, d = _rays(n, kind, rng)
    alive = jnp.asarray(rng.random(n) < 0.85, jnp.float32)
    args = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], alive)
    ref = wide_shade_planes(accel, *args, interpret=True)
    got, unres = treelet_pair_hit(
        accel, *args, k_slots=3, cap_frac=1.0, interpret=True
    )
    live = np.asarray(alive) > 0
    hit_frac = (np.asarray(ref["id"])[live] >= 0).mean()
    assert hit_frac > 0.08  # the comparison actually exercises hits
    for k in ("t", "id", "nx", "ny", "nz", "mat"):
        np.testing.assert_array_equal(
            np.asarray(got[k])[live], np.asarray(ref[k])[live],
            err_msg=f"plane {k} ({kind}, lpt={lpt}); "
                    f"unresolved={np.asarray(unres).mean():.3f}",
        )


@pytest.mark.slow
def test_pair_hit_small_cap_stays_exact(rng):
    # a tiny pair cap forces drops; the residual path must keep the
    # result exact anyway
    accel = _accel(tris=2500, lpt=2)
    n = 2048
    o, d = _rays(n, "camera", rng)
    alive = jnp.ones((n,), jnp.float32)
    args = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], alive)
    ref = wide_shade_planes(accel, *args, interpret=True)
    got, unres = treelet_pair_hit(
        accel, *args, k_slots=2, cap_frac=0.25, interpret=True
    )
    assert np.asarray(unres).any()  # the cap actually bit
    for k in ("t", "id", "nx", "ny", "nz", "mat"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))


def test_candidates_match_numpy(rng):
    # Phase A alone vs a numpy slab-stream reference
    accel = _accel(tris=1200, lpt=2)
    n = 512
    o, d = _rays(n, "hemisphere", rng)
    alive = jnp.ones((n,), jnp.float32)
    tids, bound = treelet_candidates(
        accel, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        alive, k_slots=3, interpret=True,
    )
    tids = np.asarray(tids)
    bound = np.asarray(bound)

    tb = np.asarray(accel.tboxes)
    rows = tb.shape[0]
    lo = np.stack(
        [tb[:, 8 * ax: 8 * ax + 8].reshape(-1) for ax in range(3)], axis=1
    )
    hi = np.stack(
        [tb[:, 24 + 8 * ax: 32 + 8 * ax].reshape(-1) for ax in range(3)],
        axis=1,
    )
    on = np.asarray(o, np.float32)
    dn = np.asarray(d, np.float32)
    for i in range(0, n, 37):
        inv = np.where(dn[i] == 0, 1e30,
                       1.0 / np.where(dn[i] == 0, 1, dn[i])).astype(
                           np.float32)
        t0 = (lo - on[i]) * inv
        t1 = (hi - on[i]) * inv
        tn = np.minimum(t0, t1).max(axis=1)
        tf = np.maximum(t0, t1).min(axis=1)
        hit = (tn <= tf) & (tf > 0)
        cands = np.flatnonzero(hit)
        te = np.maximum(tn[cands], 0.0)
        order = np.lexsort((cands, te))
        want = cands[order][:3]
        got = tids[:, i]
        got = got[got >= 0].astype(np.int64)
        np.testing.assert_array_equal(got, want)
        if len(cands) > 3:
            assert bound[i] == np.float32(te[order][3])
        else:
            assert bound[i] > 1e30


@pytest.mark.slow
def test_render_pair_bounces_film_identical(rng):
    # the INTEGRATED pair path (RenderSettings.pair_bounces) must produce
    # the production kernel's film bit-for-bit (measured likewise on
    # hardware at the full NEE dragon config, round 5)
    import dataclasses

    from atray_tpu.config import RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.render.wavefront import render

    accel = _accel(tris=1500, lpt=2)
    mesh = translate(
        procedural.dragon_proxy(target_tris=1500, material=1),
        (0.0, 0.0, -4.0),
    )
    scene = build_scene([mesh], materials=MATS)
    cam = look_at_camera((0, 0.7, 0.8), (0, 0, -4), h_fov=0.9, aspect=2.0)
    base = RenderSettings(resolution=(64, 32), samples_per_pixel=1,
                          bounce_limit=3, sort_bounces=True)
    key = jax.random.PRNGKey(5)

    film_walk = np.asarray(render(
        scene, cam, base, key, accel=accel))
    film_pair = np.asarray(render(
        scene, cam, dataclasses.replace(base, pair_bounces=True), key,
        accel=accel))
    np.testing.assert_array_equal(film_pair, film_walk)
    assert film_walk.std() > 0.01
