"""Lane packing: per-RAY wavefront compaction via banded one-hot matmuls.

Why this exists (docs/KERNELS.md round-3, lesson 8): the VPU lane — not
the ray — is the unit of traversal cost. After the one-shot ROW
compaction, lanes die off inside live rows (bounce 2 of the dragon frame:
~11% of lanes in the live prefix), so every ray-block pair still walks a
broad divergent union for a handful of live rays, and late bounces run at
0.6-0.9 M live rays/s. Packing live rays densely needs a per-ray
permutation, and both XLA options lose: gathers run at ~250 M elem/s
(~250 ms per 2M rays x 14 columns) and scatters are worse (scripts/
probe_r7/r10, round 2).

The TPU-native out: a permutation whose destinations are MONOTONE (a
stable compaction is) is BANDED — the sources of one 128-lane output row
live in a small contiguous window of input rows (window rows ~= 1 /
occupancy). Per output row the kernel DMAs one (C, wcap, 128) input
window and, for each window row, multiplies by a 128x128 one-hot
equality matrix on the MXU: out_row += win_row @ OH, with
OH[l_in, l_out] = (window_base + r*128 + l_in == idx[l_out]). Dynamic
lane indexing never happens — the MXU does the lane routing. Rows whose
output lanes are all invalid are skipped in the scalar domain (their
outputs come from a zero buffer aliased into the output, the same
pattern as kernels/wide_shade.py).

One primitive covers both directions:
  - ``lane_take(cols, idx)``: out[:, i] = cols[:, idx[i]]; idx < 0 means
    "no source" (output lane stays 0).
Pack: idx = ``pack_indices(alive)`` (one stable argsort — the same
primitive the row compaction already pays). Unpack of kernel results
back to the original layout: idx = ``unpack_indices(alive)`` (a cumsum,
no sort at all).

Banded-ness contract: per output row, max(idx) - min(idx) over valid
lanes must be < (wcap - 1) * 128 — for a stable pack that is occupancy
>= 1 / (wcap - 1) (wcap=32: >= 3.2%, wcap=64: >= 1.6%). The wrapper
anchors each row's window at its min index; callers guarantee the bound
(production: re-pack only while the live fraction stays above it —
below it the wavefront is too small to matter).

Reference analog: none — the reference's per-ray early break
(renderer.cpp:227-231) relies on MIMD threads skipping work per ray; this
kernel is what that idea costs on a 8x128-lane SIMD machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _lane_route_kernel(
    idx_hbm,                   # ANY (rows, 128) i32 routing plane
    w0_ref,                    # SMEM (rows,) i32 window anchor row per row
    w1_ref,                    # SMEM (rows,) i32 TRUE span rows per row
    live_ref,                  # SMEM (rows,) i32 row-live flags
    bound_ref,                 # SMEM (1,) i32: rows after the last live one
    cols_hbm,                  # ANY (C, rows, 128) f32 inputs
    zeros_hbm,                 # ANY (C, rows, 128) — aliased to out
    out_hbm,                   # ANY (C, rows, 128)
    win_ref,                   # VMEM (C, wcap, 128) input window
    idx_ref,                   # VMEM (1, 128) i32 output-row indices
    acc_ref,                   # VMEM (C, 1, 128) output accumulator
    in_sem, idx_sem, out_sem,
    *, rows: int, wcap: int, c: int,
):
    del zeros_hbm, rows

    def row(j, _):
        # the flag-check loop itself costs ~2 us/row (sequencer branch);
        # bounding the trip count at the last live row makes a packed
        # output (live prefix) cost ~nothing past its live rows
        @pl.when(live_ref[j] == 1)
        def _():
            _route_row(j)
        return 0

    def _route_row(j):
        w0 = w0_ref[j]
        cp_idx = pltpu.make_async_copy(
            idx_hbm.at[pl.ds(j, 1), :], idx_ref, idx_sem
        )
        cp_idx.start()
        cp_win = pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(w0, wcap), :], win_ref, in_sem
        )
        cp_win.start()
        cp_idx.wait()
        cp_win.wait()

        # routing values relative to the window base; invalid lanes get
        # -1, which no iota position ever equals
        rel = idx_ref[0:1, :] - w0 * LANE                    # (1, 128)
        rel = jnp.where(idx_ref[0:1, :] < 0, jnp.int32(-1), rel)
        # broadcast down sublanes: (1,128) * ones-column is the supported
        # lanes-then-sublanes splat (wide_shade lesson 4)
        relb = rel * jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

        def one(r, acc):
            # oh[l_in, l_out] = (r*128 + l_in == rel[l_out]): the MXU
            # routes window lanes to output lanes
            ohf = (sub_iota + r * LANE == relb).astype(jnp.float32)
            blk = win_ref[:, r, :]                           # (C, 128)
            return acc + jax.lax.dot_general(
                blk, ohf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def wquad(q, acc):
            # 4x unrolled: sequencer iterations, not dots, dominate the
            # inner loop. Rows past the true span can never match (their
            # iota exceeds every rel), so no per-row guard is needed —
            # the DMA'd window always holds wcap rows.
            for k in range(4):
                acc = one(q * 4 + k, acc)
            return acc

        # bound the loop by THIS row's true span (w1), not wcap: for a
        # pack, live-rows x span is ~the live ray count, not N/128
        acc = jax.lax.fori_loop(
            0, (w1_ref[j] + 3) // 4, wquad,
            jnp.zeros((c, LANE), jnp.float32),
        )
        acc_ref[:, 0, :] = acc
        cp_out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(j, 1), :], out_sem
        )
        cp_out.start()
        cp_out.wait()

    jax.lax.fori_loop(0, bound_ref[0], row, 0)


@functools.partial(jax.jit, static_argnames=("wcap", "interpret"))
def lane_take(
    cols: jnp.ndarray,     # (C, rows, 128) f32
    idx: jnp.ndarray,      # (rows*128,) i32; -1 = leave output lane 0
    wcap: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[:, i] = cols[:, idx[i]] (flat ray indexing); idx < 0 -> 0.

    idx must be banded: for every 8-output-row group, max(idx) - min(idx)
    over valid lanes < (wcap - 1) * 128. The wrapper anchors each group's
    window at min(idx)//128 (clamped so the window stays in range).
    """
    c, rows, lane = cols.shape
    assert lane == LANE
    assert rows >= wcap, "wcap window must fit the buffer"
    assert wcap % 4 == 0, "window loop is 4x unrolled"
    idxp = idx.reshape(rows, LANE)

    valid = idxp >= 0
    big = jnp.int32(rows * LANE)
    rmin = jnp.min(jnp.where(valid, idxp, big), axis=1)
    live = jnp.any(valid, axis=1).astype(jnp.int32)
    w0 = jnp.clip(rmin // LANE, 0, max(rows - wcap, 0)).astype(jnp.int32)
    w0 = jnp.where(live == 1, w0, 0)
    rmax = jnp.max(jnp.where(valid, idxp, -1), axis=1)
    w1 = jnp.clip(rmax // LANE - w0 + 1, 0, wcap).astype(jnp.int32)
    w1 = jnp.where(live == 1, w1, 0)
    bound = jnp.max(jnp.where(
        live == 1, jnp.arange(rows, dtype=jnp.int32) + 1, 0
    ))[None]

    zeros = jnp.zeros((c, rows, LANE), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _lane_route_kernel,
            rows=rows, wcap=wcap, c=c,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((c, rows, LANE), jnp.float32),
        input_output_aliases={6: 0},
        scratch_shapes=[
            pltpu.VMEM((c, wcap, LANE), jnp.float32),
            pltpu.VMEM((1, LANE), jnp.int32),
            pltpu.VMEM((c, 1, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(idxp, w0, w1, live, bound, cols, zeros)


def pack_indices(alive: jnp.ndarray) -> jnp.ndarray:
    """idx for ``lane_take`` that packs live rays to the front, stably:
    idx[p] = flat index of the p-th live ray, -1 past the live count.
    Built from a single stable argsort of the liveness key (the same
    primitive the row compaction already pays — no scatter)."""
    n = alive.shape[0]
    order = jnp.argsort(jnp.where(alive, 0, 1).astype(jnp.int32),
                        stable=True)
    n_live = jnp.sum(alive.astype(jnp.int32))
    return jnp.where(jnp.arange(n) < n_live, order.astype(jnp.int32), -1)


def unpack_indices(alive: jnp.ndarray) -> jnp.ndarray:
    """idx for ``lane_take`` that routes packed results BACK to the
    original ray layout: idx[i] = packed position of ray i (cumsum of
    liveness — no sort at all), -1 for dead rays."""
    pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
    return jnp.where(alive, pos, -1).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lane_take_p(cols, idx, inv_idx, wcap=64):
    """Differentiable ``lane_take``: a linear permutation-with-drop whose
    transpose is the take by the INVERSE index (the caller supplies it —
    for a stable pack that is ``unpack_indices``, and vice versa; invalid
    (-1) lanes zero out in both directions, which is exactly the
    transpose of the drop)."""
    interpret = jax.default_backend() == "cpu"
    return lane_take(cols, idx, wcap=wcap, interpret=interpret)


def _lane_take_p_fwd(cols, idx, inv_idx, wcap):
    return lane_take_p(cols, idx, inv_idx, wcap), (idx, inv_idx)


def _lane_take_p_bwd(wcap, res, ct):
    idx, inv_idx = res
    interpret = jax.default_backend() == "cpu"
    return (lane_take(ct, inv_idx, wcap=wcap, interpret=interpret),
            None, None)


lane_take_p.defvjp(_lane_take_p_fwd, _lane_take_p_bwd)
