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
