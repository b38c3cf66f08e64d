"""Round-3 probe #15: what does one fused-kernel CALL cost, ex-traversal?

probe_r13/r14 eliminated uniforms, shading glue, dead pairs and the walk
itself as the tail's cost. Remaining suspect: the XLA wrapper around
every wide_shade_first_hit call — the (R,3)->(7,rows,128) ray-plane
stacking, the flags reductions, the 200 MB sentinel build, and the
(NOUT,rows,128)->6x(R,.) output unpacking. Long scans (B=2 vs B=10)
difference out relay noise; marginal per iteration isolates:

  W1: dead-kernel scan        — full wrapper + skipped kernel
  W2: wrapper-replica scan    — the same XLA ops with NO pallas_call
  W3: output-unpack-only scan — consume (NOUT,rows,128) zeros
  W4: real late-bounce loop   — 4 chained kernel calls on the true
      production state evolution (bounce 0..3 respawns)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r15.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ATRAY_JAX_CACHE", os.path.expanduser("~/.cache/jax_atray")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from atray_tpu.accel.shaded import build_shaded_accel
from atray_tpu.config import KDTreeConfig
from atray_tpu.core.camera import camera_rays, look_at_camera
from atray_tpu.kernels.wide_shade import NOUT, wide_shade_first_hit
from atray_tpu.render.wavefront import _bounce_dir, ray_uniforms, to_tile_order
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080
N = W * H
LANE = 128


def bench(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=139000, material=1),
        (0.0, 0.0, -4.0),
    )
    pn = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    poff = jnp.float32(-1.8)
    planes = Planes(normals=pn[None], offsets=poff[None],
                    material_id=jnp.asarray([2], jnp.int32))
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=W / H)
    key = jax.random.PRNGKey(0)
    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    dead = jnp.zeros((N,), jnp.float32)

    def scan(body, B, *xs):
        def f(c, b):
            return body(c, b), None
        c, _ = jax.lax.scan(f, xs, jnp.arange(B))
        return c

    def marginal(label, body, *xs):
        t2 = bench(jax.jit(lambda *a: scan(body, 2, *a)), *xs)
        t10 = bench(jax.jit(lambda *a: scan(body, 10, *a)), *xs)
        print(f"{label}: B=2 {t2*1e3:7.1f} ms  B=10 {t10*1e3:7.1f} ms  "
              f"-> {(t10-t2)/8*1e3:7.2f} ms/iter")

    # W1: dead kernel (wrapper + skipped pairs)
    def w1(c, b):
        o, d = c
        out = wide_shade_first_hit(accel, o, d, alive=dead, multi_pop=4)
        return (o + out["t"][:, None] * 1e-12, d)

    marginal("W1 dead-kernel   ", w1, orig, dirn)

    # W2: wrapper replica without the pallas_call
    pad = (-N) % 2048
    total = N + pad
    rows = total // LANE

    def w2(c, b):
        o, d = c
        alive_f = dead
        if pad:
            o_ = jnp.concatenate([o, jnp.tile(o[-1:], (pad, 1))])
            d_ = jnp.concatenate([d, jnp.tile(d[-1:], (pad, 1))])
            a_ = jnp.concatenate([alive_f, jnp.zeros((pad,))])
        else:
            o_, d_, a_ = o, d, alive_f
        rays = jnp.stack([
            o_[:, 0].reshape(rows, LANE), o_[:, 1].reshape(rows, LANE),
            o_[:, 2].reshape(rows, LANE), d_[:, 0].reshape(rows, LANE),
            d_[:, 1].reshape(rows, LANE), d_[:, 2].reshape(rows, LANE),
            a_.reshape(rows, LANE),
        ])
        halves = rows // 8
        al_h = a_.reshape(halves, 8 * LANE)
        live_h = (jnp.max(al_h, axis=1) > 0.0).astype(jnp.int32)
        d_h = d_.reshape(halves, 8 * LANE, 3)
        s_h = jnp.sum(jnp.where(al_h[..., None] > 0.0, d_h, 0.0), axis=1)
        sg = (s_h > 0.0).astype(jnp.int32)
        flags = sg[:, 0] | (sg[:, 1] << 1) | (sg[:, 2] << 2) | (live_h << 3)
        neg1 = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)
        sent = jnp.concatenate([
            jnp.full((1, rows, LANE), 3.0e38),
            jnp.broadcast_to(neg1, (1, rows, LANE)),
            jnp.zeros((NOUT - 2, rows, LANE)),
        ])
        # "kernel": identity on the sentinel (forces materialization)
        out = sent + rays[0:1, :, :] * 0.0 + flags[0] * 0.0

        def flat(k):
            return out[k].reshape(-1)[:N]

        t = flat(0)
        nrm = jnp.stack([flat(2), flat(3), flat(4)], axis=1)
        return (o + t[:, None] * 1e-12 + nrm * 1e-12, d)

    marginal("W2 wrapper-replica", w2, orig, dirn)

    # W3: output unpack only
    big = jnp.zeros((NOUT, rows, LANE))

    def w3(c, b):
        o, d = c
        out = big + o[0, 0] * 0.0 + jnp.float32(b) * 0.0

        def flat(k):
            return out[k].reshape(-1)[:N]

        t = flat(0)
        nrm = jnp.stack([flat(2), flat(3), flat(4)], axis=1)
        em = jnp.stack([flat(5), flat(6), flat(7)], axis=1)
        al = jnp.stack([flat(8), flat(9), flat(10)], axis=1)
        return (o + t[:, None] * 1e-12 + (nrm + em + al) * 1e-12, d)

    marginal("W3 unpack-only   ", w3, orig, dirn)

    # W4: real chained bounces (true state evolution, 1 kernel per iter)
    ids = jnp.arange(N, dtype=jnp.int32)

    def w4(c, b):
        o, d, alive = c
        out = wide_shade_first_hit(accel, o, d,
                                   alive=alive.astype(jnp.float32),
                                   multi_pop=4)
        t_m, n_m = out["t"], out["normal"]
        hit_m = out["id"] >= 0
        denom = d @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, -(o @ pn + poff) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t_m
        t = jnp.where(closer, t_p, t_m)
        n = jnp.where(closer[:, None], pn, n_m)
        hit = alive & (hit_m | (t_p < 1e29))
        u = ray_uniforms(key, ids, b)
        newd = _bounce_dir(d, n, jnp.zeros((N,)), u)
        t_safe = jnp.where(hit, t, 0.0)
        point = o + t_safe[:, None] * d
        o2 = jnp.where(hit[:, None], point + 1e-3 * n, 1.0e7)
        d2 = jnp.where(hit[:, None], newd, jnp.asarray([0.0, 0.0, 1.0]))
        return (o2, d2, hit)

    st = (orig, dirn, jnp.ones((N,), bool))
    t2 = bench(jax.jit(lambda *a: scan(w4, 2, *a)), *st)
    t6 = bench(jax.jit(lambda *a: scan(w4, 6, *a)), *st)
    print(f"W4 real-bounces  : B=2 {t2*1e3:7.1f} ms  B=6 {t6*1e3:7.1f} ms  "
          f"-> {(t6-t2)/4*1e3:7.2f} ms/iter (late-bounce regime)")


if __name__ == "__main__":
    main()
