"""Lane-pack kernel (kernels/lane_pack.py): banded one-hot-matmul permute
— exact parity vs numpy fancy indexing, pack/unpack round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from atray_tpu.kernels.lane_pack import (
    lane_take,
    pack_indices,
    unpack_indices,
)

LANE = 128


def _cols(rng, c, rows):
    return jnp.asarray(rng.normal(size=(c, rows, LANE)).astype(np.float32))


def _ref_take(cols, idx):
    c, rows, lane = cols.shape
    flat = np.asarray(cols).reshape(c, rows * lane)
    idx = np.asarray(idx)
    out = np.zeros_like(flat)
    ok = idx >= 0
    out[:, ok] = flat[:, idx[ok]]
    return out.reshape(c, rows, lane)


def test_lane_take_identity(rng):
    cols = _cols(rng, 3, 16)
    idx = jnp.arange(16 * LANE, dtype=jnp.int32)
    out = lane_take(cols, idx, wcap=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(cols))


def test_lane_take_matches_reference_banded(rng):
    # monotone banded routing with gaps and invalid lanes
    rows, c = 24, 5
    cols = _cols(rng, c, rows)
    n = rows * LANE
    # keep ~40% of indices, stably packed: the pack_indices shape
    alive = rng.random(n) < 0.4
    idx = np.full((n,), -1, np.int64)
    src = np.nonzero(alive)[0]
    idx[: len(src)] = src
    out = lane_take(cols, jnp.asarray(idx, jnp.int32), wcap=8,
                    interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _ref_take(cols, idx))


def test_pack_unpack_round_trip(rng):
    rows, c = 32, 4
    n = rows * LANE
    cols = _cols(rng, c, rows)
    alive = jnp.asarray(rng.random(n) < 0.3)

    pidx = pack_indices(alive)
    packed = lane_take(cols, pidx, wcap=16, interpret=True)

    # packed prefix holds exactly the live rays, in order
    n_live = int(jnp.sum(alive))
    flat = np.asarray(cols).reshape(c, n)
    live_src = np.nonzero(np.asarray(alive))[0]
    np.testing.assert_array_equal(
        np.asarray(packed).reshape(c, n)[:, :n_live], flat[:, live_src]
    )
    # tail is zero
    assert float(np.abs(np.asarray(packed).reshape(c, n)[:, n_live:]).max()) == 0.0

    # unpack routes packed values back to their original lanes
    uidx = unpack_indices(alive)
    restored = lane_take(packed, uidx, wcap=16, interpret=True)
    expect = np.where(np.asarray(alive)[None, :], flat, 0.0)
    np.testing.assert_array_equal(
        np.asarray(restored).reshape(c, n), expect
    )


def test_pack_indices_are_banded(rng):
    # the contract lane_take relies on: per output ROW the index span
    # fits a wcap window once occupancy >= 1 / (wcap - 1)
    n = 64 * LANE
    alive = jnp.asarray(rng.random(n) < 0.10)   # 10% >> 1/31 for wcap=32
    pidx = np.asarray(pack_indices(alive)).reshape(-1, LANE)
    wcap = 32
    for r in range(pidx.shape[0]):
        v = pidx[r][pidx[r] >= 0]
        if len(v):
            assert v.max() - v.min() < (wcap - 1) * LANE


def _pack_scene():
    from atray_tpu.scene import build_scene, procedural
    from atray_tpu.scene.data import Planes, make_materials
    from atray_tpu.scene.transforms import translate

    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    m = translate(
        procedural.uv_sphere(rows=10, cols=10, material=1, smooth=True),
        (0, 0, -4),
    )
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]]),
        offsets=jnp.asarray([-1.4]),
        material_id=jnp.asarray([2], jnp.int32),
    )
    return build_scene([m], planes=planes, materials=mats)


def test_lane_packed_render_matches_unpacked():
    # the production integration: sort_bounces + lane_pack must produce
    # the SAME image as sort without packing and as no sort at all —
    # packing only moves rays between lanes, never changes their math
    # (needs n >= 64 rows = 8192 rays for the pack gate to engage)
    from atray_tpu.config import RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.render.wavefront import render

    scene = _pack_scene()
    cam = look_at_camera((0, 0.6, 0.7), (0, 0, -4), h_fov=0.9, aspect=2.0)
    key = jax.random.PRNGKey(0)

    def go(sort, pack):
        s = RenderSettings(
            resolution=(128, 64), samples_per_pixel=1, bounce_limit=3,
            sort_bounces=sort, lane_pack=pack,
        )
        return np.asarray(render(scene, cam, s, key))

    packed = go(True, True)
    rowonly = go(True, False)
    plain = go(False, False)
    np.testing.assert_array_equal(packed, rowonly)
    np.testing.assert_array_equal(packed, plain)
    assert plain.std() > 0.01


def test_lane_packed_grads_match_unpacked():
    # gradients flow THROUGH the pack (lane_take_p's transpose is the
    # inverse take): albedo/vertex grads of the packed render must match
    # the unpacked ones
    from atray_tpu.config import RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.render.wavefront import render

    scene = _pack_scene()
    cam = look_at_camera((0, 0.6, 0.7), (0, 0, -4), h_fov=0.9, aspect=2.0)
    key = jax.random.PRNGKey(1)

    def loss(p, pack):
        s = RenderSettings(
            resolution=(128, 64), samples_per_pixel=1, bounce_limit=3,
            sort_bounces=True, lane_pack=pack,
        )
        return jnp.sum(render(scene.with_params(p), cam, s, key))

    g1 = jax.grad(lambda p: loss(p, True))(scene.params())
    g2 = jax.grad(lambda p: loss(p, False))(scene.params())
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )
    assert float(jnp.max(jnp.abs(g1.albedo))) > 1e-4
