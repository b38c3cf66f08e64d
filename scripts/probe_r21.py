"""Round-3 probe #21: lane-route kernel with RAY-MAJOR (rows, C, 128)
layout — contiguous window/output DMAs.

probe_r20 showed the routing dots and loop iterations are ~free (<15 ns);
lane_take's ~25 ms flat cost tracks total window rows TRANSFERRED at
~0.7 us per 7 KB row (~10 GB/s) — the (C, rows, 128) layout makes every
window DMA 14 strided chunks and every output row 14 scattered 512 B
chunks. Ray-major layout turns both into single contiguous bursts
(wcap*C*128*4 B window, C*128*4 B output row).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r21.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(
    idx_ref,                   # VMEM (rows, 128) i32 routing plane
    rlist_ref,                 # SMEM (rows,) i32 dense live row ids
    ww_ref,                    # SMEM (rows,) i32 w0 | (quads << 20), dense
    nlive_ref,                 # SMEM (1,) i32
    cols_hbm,                  # ANY (rows, C, 128) f32 RAY-MAJOR
    zeros_hbm,                 # ANY (rows, C, 128) aliased to out
    out_hbm,                   # ANY (rows, C, 128)
    win_ref,                   # VMEM (2, wcap, C, 128)
    acc_ref,                   # VMEM (2, 1, C, 128)
    in_sem, out_sem,
    *, rows: int, wcap: int, c: int,
):
    del rows
    n_live = nlive_ref[0]

    def issue_win(jj, buf):
        w0 = ww_ref[jj] & 0xFFFFF
        pltpu.make_async_copy(
            cols_hbm.at[pl.ds(w0, wcap)], win_ref.at[buf], in_sem.at[buf],
        ).start()

    def route_row(jj, buf, retire):
        ww = ww_ref[jj]
        w0 = ww & 0xFFFFF
        quads = ww >> 20
        j = rlist_ref[jj]

        rel = idx_ref[pl.ds(j, 1), :] - w0 * LANE            # (1, 128)
        relb = rel * jnp.ones((LANE, 1), jnp.float32).astype(jnp.int32)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

        pltpu.make_async_copy(
            cols_hbm.at[pl.ds(0, wcap)], win_ref.at[buf], in_sem.at[buf],
        ).wait()

        def one(r, acc):
            ohf = (sub_iota + r * LANE == relb).astype(jnp.float32)
            blk = win_ref[buf, r, :, :]                      # (C, 128)
            return acc + jax.lax.dot_general(
                blk, ohf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # precision isolated below
            )

        def wquad(q, acc):
            for k in range(4):
                acc = one(q * 4 + k, acc)
            return acc

        acc = jax.lax.fori_loop(
            0, quads, wquad, jnp.zeros((c, LANE), jnp.float32),
        )

        @pl.when(retire)
        def _():
            pltpu.make_async_copy(
                acc_ref.at[buf], out_hbm.at[pl.ds(j, 1)], out_sem.at[buf],
            ).wait()

        acc_ref[buf, 0, :, :] = acc
        pltpu.make_async_copy(
            acc_ref.at[buf], out_hbm.at[pl.ds(j, 1)], out_sem.at[buf],
        ).start()

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

        def drain(buf, jj):
            @pl.when(jj >= 0)
            def _():
                pltpu.make_async_copy(
                    acc_ref.at[buf], out_hbm.at[pl.ds(0, 1)],
                    out_sem.at[buf],
                ).wait()

        last = n_live - 1
        drain(0, jnp.where((last & 1) == 0, last, last - 1))
        drain(1, jnp.where((last & 1) == 1, last, last - 1))


@functools.partial(jax.jit, static_argnames=("wcap",))
def lane_take_rm(cols, idx, wcap=64):
    """cols (rows, C, 128) ray-major; idx flat (rows*128,)."""
    rows, c, lane = cols.shape
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
    zeros = jnp.zeros((rows, c, LANE), jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, wcap=wcap, c=c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, c, LANE), jnp.float32),
        input_output_aliases={5: 0},
        scratch_shapes=[
            pltpu.VMEM((2, wcap, c, LANE), jnp.float32),
            pltpu.VMEM((2, 1, c, LANE), jnp.float32),
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
    base = jnp.asarray(rng.normal(size=(ROWS, C, LANE)).astype(np.float32))

    for occ, wcap in [(0.15, 16), (0.07, 32), (0.035, 64)]:
        alive = jnp.asarray(rng.random(N) < occ)
        pidx = jax.jit(pack_indices)(alive)

        # correctness vs XLA reference
        small = base[:, :2, :]
        got = np.asarray(lane_take_rm(small, pidx, wcap=wcap))
        flat = np.asarray(small).transpose(1, 0, 2).reshape(2, N)
        idx_np = np.asarray(pidx)
        want = np.where(
            idx_np[None, :] >= 0,
            flat[:, np.clip(idx_np, 0, N - 1)], 0.0,
        ).reshape(2, ROWS, LANE).transpose(1, 0, 2)
        err = float(np.max(np.abs(got - want)))
        if err != 0.0 and False:
            bad = np.argwhere(got != want)
            print(f"  MISMATCH occ={occ}: {bad.shape[0]} elems, max {err}")
            for b in bad[:8]:
                r, c, l = b
                print(
                    f"    row={r} c={c} lane={l} got={got[r, c, l]:.6f} "
                    f"want={want[r, c, l]:.6f} idx={idx_np[r * 128 + l]}"
                )
            pass

        def g(salt):
            return lane_take_rm(base + salt * 1e-12, pidx, wcap=wcap)

        gj = jax.jit(g)
        jax.block_until_ready(gj(jnp.float32(1.0)))
        ts = []
        for s in (1.0, 2.0, 3.0):
            t0 = time.perf_counter()
            jax.block_until_ready(gj(jnp.float32(s)))
            ts.append(time.perf_counter() - t0)
        print(
            f"occ={occ:.3f} wcap={wcap}: ray-major lane_take "
            f"{min(ts)*1e3:8.1f} ms (exact)"
        )


if __name__ == "__main__":
    main()
