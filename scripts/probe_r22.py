"""Round-3 probe #22: bisect the streaming lane-route kernel.

Every compute piece measured <31 ns/row in probe_r20 (nested loops,
dynamic reads/stores, HIGHEST dots), yet the full kernel runs at
~10-45 us per live output row. Remaining suspects are the DMA machinery.
Modes:
  full      : the real kernel
  nodma     : all DMA starts/waits removed (stale ring data — timing only)
  nocompute : DMAs kept, dots/stores removed

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r22.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kern(
    idx_ref, rlist_ref, ww_ref, nlive_ref,
    cols_hbm, zeros_hbm, out_hbm,
    ring_ref, oslab_ref, in_sem, out_sem,
    *, rows, s, c, mode,
):
    del rows
    dma = mode != "nodma"
    compute = mode != "nocompute"
    n_live = nlive_ref[0]
    n_slabs = cols_hbm.shape[1] // s

    def start_in(slab, half):
        pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(slab * s, s), :],
            ring_ref.at[:, pl.ds(half * s, s), :], in_sem.at[half],
        ).start()

    def wait_in(half):
        pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(0, s), :],
            ring_ref.at[:, pl.ds(0, s), :], in_sem.at[half],
        ).wait()

    def start_out(slab, half):
        pltpu.make_async_copy(
            oslab_ref.at[half],
            out_hbm.at[:, pl.ds(slab * s, s), :], out_sem.at[half],
        ).start()

    def wait_out(half):
        pltpu.make_async_copy(
            oslab_ref.at[half],
            out_hbm.at[:, pl.ds(0, s), :], out_sem.at[half],
        ).wait()

    @pl.when(n_live > 0)
    def _():
        if dma:
            start_in(0, 0)
            if n_slabs > 1:
                start_in(1, 1)

        def row(jj, carry):
            lo, pin0, pin1, cur, pout0, pout1 = carry
            ww = ww_ref[jj]
            w0 = ww & 0xFFFFF
            quads = ww >> 20
            j = rlist_ref[jj]
            w0_slab = w0 // s
            wend_slab = (w0 + quads * 4 - 1) // s

            def adv_body(st):
                lo_, p0_, p1_ = st
                half = lo_ % 2
                load = lo_ + 2
                pend = jnp.where(half == 0, p0_, p1_)
                if dma:
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

            touch0 = ((w0_slab % 2) == 0) | ((wend_slab % 2) == 0)
            touch1 = ((w0_slab % 2) == 1) | ((wend_slab % 2) == 1)
            if dma:
                @pl.when(touch0 & (pin0 == 1))
                def _():
                    wait_in(0)

                @pl.when(touch1 & (pin1 == 1))
                def _():
                    wait_in(1)
            pin0 = jnp.where(touch0, 0, pin0)
            pin1 = jnp.where(touch1, 0, pin1)

            os_ = j // s
            ohalf = os_ % 2
            newslab = os_ != cur

            if compute:
                ones_col = jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
                sub_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (LANE, LANE), 0)
                rel = idx_ref[pl.ds(j, 1), :] - w0 * LANE
                relb = rel * ones_col

                def one(r, acc):
                    a = w0 + r
                    ring_row = ((a // s) % 2) * s + (a % s)
                    ohf = (sub_iota + r * LANE == relb).astype(jnp.float32)
                    blk = ring_ref[:, ring_row, :]
                    return acc + jax.lax.dot_general(
                        blk, ohf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                def wquad(q, acc):
                    for k in range(4):
                        acc = one(q * 4 + k, acc)
                    return acc

                acc = jax.lax.fori_loop(
                    0, quads, wquad, jnp.zeros((c, LANE), jnp.float32))

            if dma:
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
            if dma:
                @pl.when(newslab & (ohalf == 0) & (pout0 == 1))
                def _():
                    wait_out(0)

                @pl.when(newslab & (ohalf == 1) & (pout1 == 1))
                def _():
                    wait_out(1)
            pout0 = jnp.where(newslab & (ohalf == 0), 0, pout0)
            pout1 = jnp.where(newslab & (ohalf == 1), 0, pout1)

            if compute:
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
        if dma:
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


def take(cols, idx, wcap, mode):
    from atray_tpu.kernels.lane_pack import _stream_slab_rows

    c, rows, lane = cols.shape
    s = _stream_slab_rows(rows, wcap)
    idxp = idx.reshape(rows, LANE)
    valid = idxp >= 0
    big = jnp.int32(rows * LANE)
    rmin = jnp.min(jnp.where(valid, idxp, big), axis=1)
    live = jnp.any(valid, axis=1)
    w0 = jnp.clip(rmin // LANE, 0, max(rows - wcap, 0)).astype(jnp.int32)
    w0 = jnp.where(live, w0, 0)
    rmax = jnp.max(jnp.where(valid, idxp, -1), axis=1)
    w1 = jnp.clip(rmax // LANE - w0 + 1, 0, wcap).astype(jnp.int32)
    quads = jnp.where(live, (w1 + 3) // 4, 0)
    order = jnp.argsort(jnp.where(live, 0, 1).astype(jnp.int32), stable=True)
    ww = (w0 | (quads << 20))[order]
    n_live = jnp.sum(live.astype(jnp.int32))[None]
    zeros = jnp.zeros((c, rows, LANE), jnp.float32)
    return pl.pallas_call(
        functools.partial(_kern, rows=rows, s=s, c=c, mode=mode),
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
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(idxp, order.astype(jnp.int32), ww, n_live, cols, zeros)


def main():
    from atray_tpu.kernels.lane_pack import pack_indices

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    ROWS, C = 16200, 14
    N = ROWS * LANE
    base = jnp.asarray(rng.normal(size=(C, ROWS, LANE)).astype(np.float32))

    for occ, wcap in [(0.15, 16), (0.035, 64)]:
        alive = jnp.asarray(rng.random(N) < occ)
        pidx = jax.jit(pack_indices)(alive)
        for mode in ("full", "nodma", "nocompute"):
            def g_(salt, wcap=wcap, mode=mode):
                return take(base + salt * 1e-12, pidx, wcap=wcap, mode=mode)
            g = jax.jit(g_)
            jax.block_until_ready(g(jnp.float32(0.5)))
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(g(jnp.float32(1.0 + i)))
                ts.append(time.perf_counter() - t0)
            print(f"occ={occ:.3f} wcap={wcap} {mode:10s}: "
                  f"{min(ts)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
