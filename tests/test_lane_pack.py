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


def test_lane_take_stream_multislab(rng):
    # > 2048 rows takes the streaming-slab kernel with MULTIPLE slabs
    # (rows=2560 -> S=512, 5 slabs): exercises the ring advance, the
    # lazy half waits, sparse-output slab skipping (unpack), and the
    # slab flush/zero logic — all invisible at single-slab test sizes.
    from atray_tpu.kernels.lane_pack import unpack_indices

    rows, c = 2560, 3
    n = rows * LANE
    cols = _cols(rng, c, rows)
    # clustered liveness so window anchors jump whole slabs
    alive = rng.random(n) < 0.04
    alive[: n // 4] = False
    alive[n // 2 : n // 2 + n // 8] = rng.random(n // 8) < 0.3
    alive_j = jnp.asarray(alive)

    pidx = pack_indices(alive_j)
    packed = lane_take(cols, pidx, wcap=64, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(packed), _ref_take(cols, np.asarray(pidx))
    )

    uidx = unpack_indices(alive_j)
    restored = lane_take(packed, uidx, wcap=64, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(restored), _ref_take(packed, np.asarray(uidx))
    )


def test_lane_scatter_matches_reference(rng):
    # scatter = the cumsum-only routing direction: dst built from a plain
    # cumsum over liveness, out[:, dst[i]] = cols[:, i]
    from atray_tpu.kernels.lane_pack import lane_scatter

    rows, c = 2560, 4
    n = rows * LANE
    cols = _cols(rng, c, rows)
    alive = rng.random(n) < 0.05
    alive[: n // 3] = False
    dst = np.where(alive, np.cumsum(alive) - 1, -1).astype(np.int32)

    out = lane_scatter(cols, jnp.asarray(dst), wcap=64, interpret=True)
    want = np.zeros((c, n), np.float32)
    flat = np.asarray(cols).reshape(c, n)
    want[:, dst[alive]] = flat[:, alive]
    np.testing.assert_array_equal(
        np.asarray(out).reshape(c, n), want
    )


def test_lane_scatter_unpack_direction(rng):
    # scatter with dst = sparse original positions (the per-bounce color
    # delta bank-back): monotone but gappy destinations
    from atray_tpu.kernels.lane_pack import lane_scatter

    rows, c = 2560, 3
    n = rows * LANE
    cols = _cols(rng, c, rows)
    n_live = n // 20
    positions = np.sort(
        rng.choice(n, size=n_live, replace=False)
    ).astype(np.int32)
    dst = np.full(n, -1, np.int32)
    dst[:n_live] = positions                      # packed prefix -> spread

    out = lane_scatter(cols, jnp.asarray(dst), wcap=64, interpret=True)
    want = np.zeros((c, n), np.float32)
    flat = np.asarray(cols).reshape(c, n)
    want[:, positions] = flat[:, :n_live]
    np.testing.assert_array_equal(np.asarray(out).reshape(c, n), want)


def test_lane_take_scatter_vjp_pair(rng):
    # the adjoint of gather is duplicate-summing scatter and vice versa:
    # check both custom VJPs against explicit jacobian-vector products
    from atray_tpu.kernels.lane_pack import lane_scatter_p, lane_take_p

    rows, c = 16, 2
    n = rows * LANE
    cols = _cols(rng, c, rows)
    alive = rng.random(n) < 0.3
    pidx = np.asarray(pack_indices(jnp.asarray(alive)))
    dst = np.where(alive, np.cumsum(alive) - 1, -1).astype(np.int32)

    ct = jnp.asarray(rng.normal(size=(c, rows, LANE)).astype(np.float32))

    # take VJP == scatter of the cotangent
    _, vjp_t = jax.vjp(
        lambda x: lane_take_p(x, jnp.asarray(pidx), 8), cols
    )
    got_t = np.asarray(vjp_t(ct)[0]).reshape(c, n)
    want_t = np.zeros((c, n), np.float32)
    ctf = np.asarray(ct).reshape(c, n)
    valid = pidx >= 0
    np.add.at(want_t.T, pidx[valid], ctf.T[valid])
    np.testing.assert_array_equal(got_t, want_t)

    # scatter VJP == take of the cotangent
    _, vjp_s = jax.vjp(
        lambda x: lane_scatter_p(x, jnp.asarray(dst), 8), cols
    )
    got_s = np.asarray(vjp_s(ct)[0]).reshape(c, n)
    want_s = np.where(
        dst[None, :] >= 0, ctf[:, np.clip(dst, 0, n - 1)], 0.0
    )
    np.testing.assert_array_equal(got_s, want_s)


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
            resolution=(128, 64), samples_per_pixel=1, bounce_limit=4,
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
            resolution=(128, 64), samples_per_pixel=1, bounce_limit=4,
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


def test_lane_pack_gid_exact_beyond_f32_int_range():
    # ADVICE r4 (medium): global ray ids used to ride the pack as ONE f32
    # plane — exact only to 2^24, while frame-global ids reach ~33M+ at
    # 1080p x 16spp. They now route as two exact half-planes
    # (_gid_planes/_gid_join); this pins the round-trip at large ids.
    from atray_tpu.render.wavefront import _lane_pack_state

    n = 64 * 128 * 2
    rng = np.random.default_rng(0)
    alive = jnp.asarray(rng.random(n) < 0.4)
    base = 2 ** 25 + 3            # far beyond f32 integer exactness
    gid = jnp.arange(base, base + n, dtype=jnp.int32)
    f = jnp.zeros((n,), jnp.float32)
    state = (f, f, f, f, f, jnp.ones((n,)), f, f, f, f, f, f,
             alive, gid, jnp.float32(0.0))
    packed, _ = _lane_pack_state(state)
    got = np.asarray(packed[13])[np.asarray(packed[12])]
    want = np.asarray(gid)[np.asarray(alive)]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    # adjacent large ids must stay DISTINCT (the old single-plane route
    # collapsed groups of up to 4 here)
    assert len(np.unique(got)) == len(got)
