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
occupancy). Per output row the kernel holds one (C, wcap, 128) input
window and, for each window row, multiplies by a 128x128 one-hot
equality matrix on the MXU: out_row += win_row @ OH, with
OH[l_in, l_out] = (window_base + r*128 + l_in == idx[l_out]). Dynamic
lane indexing never happens — the MXU does the lane routing.

Pipeline shape (v3): the ROUTING plane rides into VMEM as a normal
kernel input, dead output rows are excluded up front by a DENSE
live-row list built in XLA, and — the decisive part (probe_r20/r21) —
the DMAs are SLAB-STREAMED: per-output-row window DMAs cost ~0.4-0.7 us
per descriptor x C columns x 2 directions (~10 GB/s effective; the
routing dots and loop iterations are <15 ns each and irrelevant), so
the input instead streams ONCE through a 2-slab VMEM ring in S-row
slabs and output rows accumulate in double-buffered VMEM slabs flushed
slab-wise. Descriptors amortize over S rows and overlapping windows
stop being re-transferred.

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
    idx_ref,                   # VMEM (rows, 128) i32 routing plane
    rlist_ref,                 # SMEM (rows,) i32: dense live row ids
    ww_ref,                    # SMEM (rows,) i32: w0 | (quads << 20), dense
    nlive_ref,                 # SMEM (1,) i32: live row count
    cols_hbm,                  # ANY (C, rows, 128) f32 inputs
    zeros_hbm,                 # ANY (C, rows, 128) — aliased to out
    out_hbm,                   # ANY (C, rows, 128)
    win_ref,                   # VMEM (2, C, wcap, 128) input windows
    acc_ref,                   # VMEM (2, C, 1, 128) output accumulators
    in_sem, out_sem,           # DMA sems, shape (2,)
    *, rows: int, wcap: int, c: int,
):
    del rows
    n_live = nlive_ref[0]

    def issue_win(jj, buf):
        w0 = ww_ref[jj] & 0xFFFFF
        cp = pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(w0, wcap), :],
            win_ref.at[buf], in_sem.at[buf],
        )
        cp.start()

    def route_row(jj, buf, retire):
        """Accumulate output row ``rlist[jj]`` from window buffer ``buf``
        (already DMA'd; waits its semaphore), then start its output DMA.
        ``retire`` (traced bool) marks that this accumulator has an
        in-flight output DMA from 2 rows ago to retire first — waited
        AFTER the routing dots, so it drains behind them."""
        ww = ww_ref[jj]
        w0 = ww & 0xFFFFF
        quads = ww >> 20
        j = rlist_ref[jj]

        rel = idx_ref[pl.ds(j, 1), :] - w0 * LANE            # (1, 128)
        # broadcast down sublanes: (1,128) * ones-column is the supported
        # lanes-then-sublanes splat (wide_shade lesson 4). Invalid (-1)
        # source lanes go negative and can never match the iota.
        relb = rel * jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

        pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(0, wcap), :],  # byte-count match only
            win_ref.at[buf], in_sem.at[buf],
        ).wait()

        def one(r, acc):
            # oh[l_in, l_out] = (r*128 + l_in == rel[l_out]): the MXU
            # routes window lanes to output lanes. Precision MUST be
            # HIGHEST: the default bf16-operand matmul TRUNCATES the
            # routed values (probe_r21 caught production planes coming
            # back bf16-rounded — fatal for the gid plane). HIGHEST's
            # 3-way bf16 split is exact for one-hot routing: x splits as
            # hi+mid+lo exactly, each part rides one pass, and the f32
            # accumulation of the three parts reconstructs x bit-exactly
            # (disjoint exponent ranges, one source per output lane).
            ohf = (sub_iota + r * LANE == relb).astype(jnp.float32)
            blk = win_ref[buf, :, r, :]                      # (C, 128)
            return acc + jax.lax.dot_general(
                blk, ohf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def wquad(q, accs):
            # 4x unrolled with FOUR INDEPENDENT accumulators: a chain of
            # dependent dots serializes on the ~1.3 us MXU result latency
            # (probe_r18); independent accumulators let consecutive dots
            # pipeline at issue rate instead.
            return tuple(
                one(q * 4 + k, accs[k]) for k in range(4)
            )

        # bound the loop by THIS row's true span, not wcap: for a pack,
        # live-rows x span is ~the live ray count, not N/128
        z = jnp.zeros((c, LANE), jnp.float32)
        accs = jax.lax.fori_loop(0, quads, wquad, (z, z, z, z))
        acc = (accs[0] + accs[1]) + (accs[2] + accs[3])

        @pl.when(retire)
        def _():
            # retire the output DMA issued from this accumulator 2 rows
            # ago before overwriting it (byte-count-matched wait)
            pltpu.make_async_copy(
                acc_ref.at[buf], out_hbm.at[:, pl.ds(j, 1), :],
                out_sem.at[buf],
            ).wait()

        acc_ref[buf, :, 0, :] = acc
        pltpu.make_async_copy(
            acc_ref.at[buf], out_hbm.at[:, pl.ds(j, 1), :], out_sem.at[buf],
        ).start()

    # software pipeline, 2-unrolled for static buffer parity: while row
    # 2i routes from buffer 0, row 2i+1's window streams into buffer 1
    @pl.when(n_live > 0)
    def _():
        issue_win(0, 0)

        def pair(i, _):
            jj0 = 2 * i
            jj1 = jj0 + 1

            @pl.when(jj1 < n_live)
            def _():
                issue_win(jj1, 1)

            route_row(jj0, 0, i > 0)

            @pl.when(jj1 < n_live)
            def _():
                @pl.when(jj1 + 1 < n_live)
                def _():
                    issue_win(jj1 + 1, 0)

                route_row(jj1, 1, i > 0)

            return 0

        jax.lax.fori_loop(0, (n_live + 1) // 2, pair, 0)

        # retire the last output DMA on each buffer (exactly one remains
        # in flight per buffer that ever issued)
        def drain(buf, jj):
            @pl.when(jj >= 0)
            def _():
                pltpu.make_async_copy(
                    acc_ref.at[buf], out_hbm.at[:, pl.ds(0, 1), :],
                    out_sem.at[buf],
                ).wait()

        last = n_live - 1
        drain(0, jnp.where((last & 1) == 0, last, last - 1))
        drain(1, jnp.where((last & 1) == 1, last, last - 1))


def _lane_stream_kernel(
    idx_ref,                   # VMEM (rows, 128) i32 routing plane
    rlist_ref,                 # SMEM (rows,) i32: dense live row ids, ASC
    ww_ref,                    # SMEM (rows,) i32: w0 | (quads << 20), dense
    nlive_ref,                 # SMEM (1,) i32: live row count
    cols_hbm,                  # ANY (C, rows, 128) f32 inputs
    zeros_hbm,                 # ANY (C, rows, 128) — aliased to out
    out_hbm,                   # ANY (C, rows, 128)
    ring_ref,                  # VMEM (C, 2*S, 128) input slab ring
    oslab_ref,                 # VMEM (2, C, S, 128) output slabs
    in_sem, out_sem,           # DMA sems, shape (2,)
    *, rows: int, s: int, c: int, scatter: bool = False,
):
    """Streaming slab router: same routing math as _lane_route_kernel but
    the input is DMA'd exactly ONCE in S-row slabs through a 2-slab VMEM
    ring, and output rows accumulate in VMEM slabs flushed slab-wise.
    The per-output-row kernel pays ~2 strided DMAs (14 descriptors each)
    PER ROW — measured ~0.4-0.7 us per descriptor, 10 GB/s effective,
    which was the whole cost (probe_r20/21: dots and loop iterations are
    <15 ns). Here descriptors amortize over S rows.

    Requires: rlist ascending, windows [w0, w0+4*quads) within
    [w0_slab*S, (w0_slab+2)*S) — guaranteed by wcap <= S and the
    wrapper's w0 clamp."""
    del rows
    n_live = nlive_ref[0]
    n_slabs = cols_hbm.shape[1] // s

    def start_in(slab, half):
        pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(slab * s, s), :],
            ring_ref.at[:, pl.ds(half * s, s), :],
            in_sem.at[half],
        ).start()

    def wait_in(half):
        pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(0, s), :],      # byte-count match only
            ring_ref.at[:, pl.ds(0, s), :],
            in_sem.at[half],
        ).wait()

    def start_out(slab, half):
        pltpu.make_async_copy(
            oslab_ref.at[half],
            out_hbm.at[:, pl.ds(slab * s, s), :],
            out_sem.at[half],
        ).start()

    def wait_out(half):
        pltpu.make_async_copy(
            oslab_ref.at[half],
            out_hbm.at[:, pl.ds(0, s), :],       # byte-count match only
            out_sem.at[half],
        ).wait()

    @pl.when(n_live > 0)
    def _():
        start_in(0, 0)
        if n_slabs > 1:
            start_in(1, 1)

        def row(jj, carry):
            # lo: lowest resident input slab; pin0/pin1: in-DMA pending
            # per ring half; cur: output slab being filled (-1 = none);
            # pout0/pout1: out-DMA pending per output half
            lo, pin0, pin1, cur, pout0, pout1 = carry
            ww = ww_ref[jj]
            w0 = ww & 0xFFFFF
            quads = ww >> 20
            j = rlist_ref[jj]
            w0_slab = w0 // s
            wend_slab = (w0 + quads * 4 - 1) // s

            # ---- advance the input ring until w0's slab is resident ----
            def adv_body(st):
                lo_, p0_, p1_ = st
                half = lo_ % 2           # holds slab lo_, being retired
                load = lo_ + 2           # next slab for this half
                pend = jnp.where(half == 0, p0_, p1_)

                @pl.when((pend == 1) & (half == 0))
                def _():
                    wait_in(0)

                @pl.when((pend == 1) & (half == 1))
                def _():
                    wait_in(1)

                @pl.when((load < n_slabs) & (half == 0))
                def _():
                    start_in(load, 0)

                @pl.when((load < n_slabs) & (half == 1))
                def _():
                    start_in(load, 1)

                newp = jnp.where(load < n_slabs, 1, 0)
                p0_ = jnp.where(half == 0, newp, p0_)
                p1_ = jnp.where(half == 1, newp, p1_)
                return lo_ + 1, p0_, p1_

            lo, pin0, pin1 = jax.lax.while_loop(
                lambda st: w0_slab > st[0], adv_body, (lo, pin0, pin1)
            )

            # ---- wait the halves this window touches --------------------
            touch0 = ((w0_slab % 2) == 0) | ((wend_slab % 2) == 0)
            touch1 = ((w0_slab % 2) == 1) | ((wend_slab % 2) == 1)

            @pl.when(touch0 & (pin0 == 1))
            def _():
                wait_in(0)

            @pl.when(touch1 & (pin1 == 1))
            def _():
                wait_in(1)

            pin0 = jnp.where(touch0, 0, pin0)
            pin1 = jnp.where(touch1, 0, pin1)

            # ---- routing dots (same math/precision as _lane_route) ------
            ones_col = jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
            if not scatter:
                rel = idx_ref[pl.ds(j, 1), :] - w0 * LANE    # (1, 128)
                relb = rel * ones_col

            def one(r, acc):
                a = w0 + r                                   # absolute row
                ring_row = ((a // s) % 2) * s + (a % s)
                blk = ring_ref[:, ring_row, :]               # (C, 128)
                if scatter:
                    # dst plane of the WINDOW row: where each input lane
                    # lands. M[l_out, l_in] = (dst[l_in] - j*128 == l_out)
                    # — built with dst in LANES and l_out as the sublane
                    # iota (no transpose), consumed by contracting the
                    # RHS's dim 1 (B^T matmul, native on MXU: probe_r18).
                    reld = idx_ref[pl.ds(a, 1), :] - j * LANE
                    mb = reld * ones_col                     # (128, 128)
                    ohf = (sub_iota == mb).astype(jnp.float32)
                    return acc + jax.lax.dot_general(
                        blk, ohf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                ohf = (sub_iota + r * LANE == relb).astype(jnp.float32)
                return acc + jax.lax.dot_general(
                    blk, ohf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            def wquad(q, accs):
                # 4x unrolled with FOUR INDEPENDENT accumulators (same fix
                # as _lane_route_kernel / probe_r18): a chain of dependent
                # dots serializes on the ~1.3 us MXU result latency, which
                # WAS the streaming kernel's ~30 ms occupancy-invariant
                # flat cost (window-row visits are ~rows regardless of
                # occupancy). Exact: one-hot routing gives every output
                # lane exactly one nonzero contribution, so regrouping the
                # partial sums only ever adds zeros.
                return tuple(one(q * 4 + k, accs[k]) for k in range(4))

            z = jnp.zeros((c, LANE), jnp.float32)
            accs = jax.lax.fori_loop(0, quads, wquad, (z, z, z, z))
            acc = (accs[0] + accs[1]) + (accs[2] + accs[3])

            # ---- output slab bookkeeping --------------------------------
            os_ = j // s
            ohalf = os_ % 2
            newslab = os_ != cur

            # flush the slab we were filling
            @pl.when(newslab & (cur >= 0) & ((cur % 2) == 0))
            def _():
                start_out(cur, 0)

            @pl.when(newslab & (cur >= 0) & ((cur % 2) == 1))
            def _():
                start_out(cur, 1)

            fl0 = newslab & (cur >= 0) & ((cur % 2) == 0)
            fl1 = newslab & (cur >= 0) & ((cur % 2) == 1)
            pout0 = jnp.where(fl0, 1, pout0)
            pout1 = jnp.where(fl1, 1, pout1)

            # entering a new slab: retire its half's old flush, zero it
            @pl.when(newslab & (ohalf == 0) & (pout0 == 1))
            def _():
                wait_out(0)

            @pl.when(newslab & (ohalf == 1) & (pout1 == 1))
            def _():
                wait_out(1)

            pout0 = jnp.where(newslab & (ohalf == 0), 0, pout0)
            pout1 = jnp.where(newslab & (ohalf == 1), 0, pout1)

            @pl.when(newslab & (ohalf == 0))
            def _():
                oslab_ref[0] = jnp.zeros((c, s, LANE), jnp.float32)

            @pl.when(newslab & (ohalf == 1))
            def _():
                oslab_ref[1] = jnp.zeros((c, s, LANE), jnp.float32)

            orow = j - os_ * s

            @pl.when(ohalf == 0)
            def _():
                oslab_ref[0, :, orow, :] = acc

            @pl.when(ohalf == 1)
            def _():
                oslab_ref[1, :, orow, :] = acc

            cur = jnp.where(newslab, os_, cur)
            return lo, pin0, pin1, cur, pout0, pout1

        carry = jax.lax.fori_loop(
            0, n_live, row,
            (jnp.int32(0), jnp.int32(1),
             jnp.int32(1 if n_slabs > 1 else 0),
             jnp.int32(-1), jnp.int32(0), jnp.int32(0)),
        )
        lo, pin0, pin1, cur, pout0, pout1 = carry

        # final flush + drain every pending DMA before kernel exit
        @pl.when((cur >= 0) & ((cur % 2) == 0))
        def _():
            start_out(cur, 0)
            wait_out(0)

        @pl.when((cur >= 0) & ((cur % 2) == 1))
        def _():
            start_out(cur, 1)
            wait_out(1)

        @pl.when((pout0 == 1) & ~((cur >= 0) & ((cur % 2) == 0)))
        def _():
            wait_out(0)

        @pl.when((pout1 == 1) & ~((cur >= 0) & ((cur % 2) == 1)))
        def _():
            wait_out(1)

        @pl.when(pin0 == 1)
        def _():
            wait_in(0)

        @pl.when(pin1 == 1)
        def _():
            wait_in(1)


def _stream_slab_rows(rows: int, wcap: int) -> int:
    """Largest divisor of ``rows`` in [wcap, 512] (slab row count), or 0
    if streaming is not worth it / not possible."""
    if rows <= 2048:
        return rows                      # single resident slab
    for s in range(min(512, rows), wcap - 1, -1):
        if rows % s == 0:
            return s
    return 0


@functools.partial(
    jax.jit, static_argnames=("wcap", "interpret", "anchor_align")
)
def lane_take(
    cols: jnp.ndarray,     # (C, rows, 128) f32
    idx: jnp.ndarray,      # (rows*128,) i32; -1 = leave output lane 0
    wcap: int = 64,
    interpret: bool = False,
    anchor_align: int = 0,
) -> jnp.ndarray:
    """out[:, i] = cols[:, idx[i]] (flat ray indexing); idx < 0 -> 0.

    idx must be banded: for every 128-lane output row, max(idx) - min(idx)
    over valid lanes < (wcap - 1) * 128. The wrapper anchors each row's
    window at min(idx)//128 (clamped so the window stays in range).

    Large buffers (> 2048 rows) take the streaming-slab kernel, which
    additionally requires the per-row window anchors to be NON-DECREASING
    across live output rows — true of every MONOTONE permutation (stable
    pack, unpack, stable partition). Small buffers keep the per-row
    window kernel, which accepts any banded idx.
    """
    c, rows, lane = cols.shape
    assert lane == LANE
    assert rows >= wcap, "wcap window must fit the buffer"
    assert wcap % 4 == 0, "window loop is 4x unrolled"
    idxp = idx.reshape(rows, LANE)

    valid = idxp >= 0
    big = jnp.int32(rows * LANE)
    rmin = jnp.min(jnp.where(valid, idxp, big), axis=1)
    live = jnp.any(valid, axis=1)
    w0 = (rmin // LANE).astype(jnp.int32)
    if anchor_align > 1:
        # segment-local (non-monotone within a segment) index maps keep
        # their anchors uniform per segment — see lane_scatter
        w0 = (w0 // anchor_align) * anchor_align
    w0 = jnp.clip(w0, 0, max(rows - wcap, 0))
    w0 = jnp.where(live, w0, 0)
    rmax = jnp.max(jnp.where(valid, idxp, -1), axis=1)
    w1 = jnp.clip(rmax // LANE - w0 + 1, 0, wcap).astype(jnp.int32)
    quads = jnp.where(live, (w1 + 3) // 4, 0)

    # dense live-row schedule: rlist[jj] = id of the jj-th live output
    # row; ww packs its window anchor (20 bits) and quad count. The
    # kernel loops over exactly n_live rows — a dead row costs nothing
    # (the in-kernel per-row flag scan this replaces measured ~2 us/row,
    # the whole bill for the scattered-output unpack direction).
    order = jnp.argsort(jnp.where(live, 0, 1).astype(jnp.int32), stable=True)
    rlist = order.astype(jnp.int32)
    ww = (w0 | (quads << 20))[order]
    n_live = jnp.sum(live.astype(jnp.int32))[None]

    zeros = jnp.zeros((c, rows, LANE), jnp.float32)
    common = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((c, rows, LANE), jnp.float32),
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )
    s = _stream_slab_rows(rows, wcap)
    if s:
        call = pl.pallas_call(
            functools.partial(_lane_stream_kernel, rows=rows, s=s, c=c),
            scratch_shapes=[
                pltpu.VMEM((c, 2 * s, LANE), jnp.float32),
                pltpu.VMEM((2, c, s, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **common,
        )
    else:
        call = pl.pallas_call(
            functools.partial(_lane_route_kernel, rows=rows, wcap=wcap, c=c),
            scratch_shapes=[
                pltpu.VMEM((2, c, wcap, LANE), jnp.float32),
                pltpu.VMEM((2, c, 1, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **common,
        )
    return call(idxp, rlist, ww, n_live, cols, zeros)


@functools.partial(
    jax.jit, static_argnames=("wcap", "interpret", "anchor_align")
)
def lane_scatter(
    cols: jnp.ndarray,     # (C, rows, 128) f32
    dst: jnp.ndarray,      # (rows*128,) i32; -1 = drop this input lane
    wcap: int = 64,
    interpret: bool = False,
    anchor_align: int = 0,
) -> jnp.ndarray:
    """out[:, dst[i]] = cols[:, i] (flat ray indexing); dst < 0 drops the
    lane; output lanes nobody targets stay 0; duplicate dsts SUM.

    dst must be MONOTONE over valid lanes (non-decreasing — a stable
    pack/unpack/partition destination map is) and banded: the input lanes
    feeding one output row span < wcap input rows. Because dst is
    monotone it is built with a plain cumsum — no argsort anywhere,
    which is the point: per-bounce wavefront re-packing pays one cumsum
    + one kernel call. Bit-exact (HIGHEST-precision one-hot routing).

    ``anchor_align`` relaxes monotonicity to SEGMENT-LOCAL permutations:
    with anchor_align = A (input rows), window anchors floor to multiples
    of A, so dst may reorder freely WITHIN each A-row input segment (e.g.
    a per-neighborhood counting sort by direction octant) as long as each
    output row's sources span < wcap rows from its floored anchor. The
    floored anchors are non-decreasing whenever segments map to
    non-decreasing output ranges, which keeps the streaming ring legal.
    """
    c, rows, lane = cols.shape
    assert lane == LANE
    assert rows >= wcap, "wcap window must fit the buffer"
    assert wcap % 4 == 0, "window loop is 4x unrolled"
    s = _stream_slab_rows(rows, wcap)
    assert s, "lane_scatter requires a streaming slab size (divisor rows)"
    dstp = dst.reshape(rows, LANE)

    valid = dstp >= 0
    big = jnp.int32(rows * LANE)
    # per-INPUT-row dst extents, hole-filled to stay monotone
    dmin_r = jnp.min(jnp.where(valid, dstp, big), axis=1)
    dmax_r = jnp.max(jnp.where(valid, dstp, -1), axis=1)
    dmax_m = jax.lax.cummax(dmax_r)
    dmin_m = jnp.flip(jax.lax.cummin(jnp.flip(dmin_r)))
    # output row j draws from input rows q with
    #   dmax[q] >= j*128  and  dmin[q] < (j+1)*128
    jgrid = jnp.arange(rows, dtype=jnp.int32) * LANE
    w0 = jnp.searchsorted(dmax_m, jgrid, side="left").astype(jnp.int32)
    wend = (
        jnp.searchsorted(dmin_m, jgrid + LANE, side="left").astype(jnp.int32)
        - 1
    )
    live = (w0 <= wend) & (wend >= 0) & (w0 < rows)
    if anchor_align > 1:
        w0 = (w0 // anchor_align) * anchor_align
    w0 = jnp.clip(w0, 0, max(rows - wcap, 0))
    w0 = jnp.where(live, w0, 0)
    span = jnp.clip(wend - w0 + 1, 0, wcap)
    quads = jnp.where(live, (span + 3) // 4, 0)

    order = jnp.argsort(jnp.where(live, 0, 1).astype(jnp.int32), stable=True)
    rlist = order.astype(jnp.int32)
    ww = (w0 | (quads << 20))[order]
    n_live = jnp.sum(live.astype(jnp.int32))[None]

    zeros = jnp.zeros((c, rows, LANE), jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _lane_stream_kernel, rows=rows, s=s, c=c, scatter=True,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((c, rows, LANE), jnp.float32),
        input_output_aliases={5: 0},
        scratch_shapes=[
            pltpu.VMEM((c, 2 * s, LANE), jnp.float32),
            pltpu.VMEM((2, c, s, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(dstp, rlist, ww, n_live, cols, zeros)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lane_take_p(cols, idx, wcap=64, anchor_align=0):
    """Differentiable ``lane_take``. The take y[:, i] = x[:, idx[i]] is
    linear in x; its exact transpose is the SCATTER by the same index
    (ct_x[:, idx[i]] += ct_y[:, i]) — duplicate-summing scatter is the
    adjoint of gather, so the pair needs no inverse-index plumbing."""
    interpret = jax.default_backend() == "cpu"
    return lane_take(cols, idx, wcap=wcap, interpret=interpret,
                     anchor_align=anchor_align)


def _lane_take_p_fwd(cols, idx, wcap, anchor_align):
    return lane_take_p(cols, idx, wcap, anchor_align), idx


def _lane_take_p_bwd(wcap, anchor_align, idx, ct):
    interpret = jax.default_backend() == "cpu"
    return (lane_scatter(ct, idx, wcap=wcap, interpret=interpret,
                         anchor_align=anchor_align), None)


lane_take_p.defvjp(_lane_take_p_fwd, _lane_take_p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lane_scatter_p(cols, dst, wcap=64, anchor_align=0):
    """Differentiable ``lane_scatter``; transpose is the take by ``dst``
    (the mirror image of ``lane_take_p``)."""
    interpret = jax.default_backend() == "cpu"
    return lane_scatter(cols, dst, wcap=wcap, interpret=interpret,
                        anchor_align=anchor_align)


def _lane_scatter_p_fwd(cols, dst, wcap, anchor_align):
    return lane_scatter_p(cols, dst, wcap, anchor_align), dst


def _lane_scatter_p_bwd(wcap, anchor_align, dst, ct):
    interpret = jax.default_backend() == "cpu"
    return (lane_take(ct, dst, wcap=wcap, interpret=interpret,
                      anchor_align=anchor_align), None)


lane_scatter_p.defvjp(_lane_scatter_p_fwd, _lane_scatter_p_bwd)
