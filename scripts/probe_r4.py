"""Round-2 probe #4: ordered vs unordered push at ni=2, K=4.

Same bench-scene workloads as probe_r3 (dragon 139k + floor): coherent
primaries, bounce-1 (dense incoherent), bounce-2 (sparse), bounce-2
spatial-sorted. Winner config feeds the production split
(primary: ordered; scanned bounces: measured here).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r4.py
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
from atray_tpu.kernels.wide_shade import wide_shade_first_hit
from atray_tpu.render.wavefront import _bounce_dir, ray_uniforms, to_tile_order
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate


def timeit(fn, *a, iters=3):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(os.environ.get("N_RAYS", str(1920 * 1080)))
    tris = int(os.environ.get("PROBE_TRIS", "139000"))

    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    dragon = translate(
        procedural.dragon_proxy(target_tris=tris, material=1), (0.0, 0.0, -4.0)
    )
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    print(f"n_rays={n} tris={tris} nodes={accel.num_nodes} "
          f"device={jax.devices()[0]}", flush=True)
    w, h = 1920, 1080
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, 1)
    orig = to_tile_order(orig, w, h, 1)[:n]
    dirn = to_tile_order(dirn, w, h, 1)[:n]
    key = jax.random.PRNGKey(0)

    kernels = {
        ordt: jax.jit(
            lambda o_, d_, a_, ordt=ordt: wide_shade_first_hit(
                accel, o_, d_, alive=a_, multi_pop=4, ordered=ordt
            )["t"]
        )
        for ordt in (True, False)
    }

    def row(label, o_, d_, a_):
        nlive = float(jnp.sum(a_))
        base = None
        for ordt, jk in kernels.items():
            dt = timeit(jk, o_, d_, a_)
            if base is None:
                base = dt
            print(
                f"{label:22s} ordered={int(ordt)}: {dt*1e3:7.1f} ms "
                f"{n/dt/1e6:6.2f} Mwork/s {nlive/dt/1e6:6.2f} Mlive/s "
                f"({base/dt:.2f}x)",
                flush=True,
            )

    # parity: ordered vs unordered must agree exactly
    t1 = jax.device_get(kernels[True](orig, dirn, jnp.ones((n,), jnp.float32)))
    t0_ = jax.device_get(kernels[False](orig, dirn, jnp.ones((n,), jnp.float32)))
    print(f"ordered/unordered parity: {np.array_equal(t1, t0_)}", flush=True)

    ones = jnp.ones((n,), jnp.float32)
    row("A coherent", orig, dirn, ones)

    @jax.jit
    def step(o, d, alive, b, k):
        fo = wide_shade_first_hit(accel, o, d, alive=alive.astype(jnp.float32))
        pn = jnp.asarray([0.0, 1.0, 0.0])
        denom = d @ pn
        tp = jnp.where(jnp.abs(denom) > 1e-12, (-1.8 - o @ pn) / denom, 3e38)
        tp = jnp.where(tp > 1e-4, tp, 3e38)
        t = jnp.minimum(fo["t"], tp)
        pl_hit = tp < fo["t"]
        nrm = jnp.where(pl_hit[:, None], pn[None, :], fo["normal"])
        sc = jnp.where(pl_hit, 0.0, fo["scatter"])
        hit = alive & ((fo["id"] >= 0) | pl_hit) & (t < 1e30)
        uni = ray_uniforms(k, jnp.arange(o.shape[0], dtype=jnp.int32), b, 3)
        cos_in = jnp.sum(-d * nrm, axis=1)
        no = jnp.where((cos_in < 0)[:, None], -nrm, nrm)
        nd = _bounce_dir(d, no, sc, uni)
        t_safe = jnp.where(hit, jnp.where(t < 1e30, t, 0.0), 0.0)
        o2 = jnp.where(hit[:, None], o + t_safe[:, None] * d, 1.0e7)
        d2 = jnp.where(hit[:, None], nd, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, hit

    o1, d1, a1 = jax.block_until_ready(
        step(orig, dirn, jnp.ones((n,), bool), 1, key))
    row("B bounce-1", o1, d1, a1.astype(jnp.float32))

    o2, d2, a2 = jax.block_until_ready(step(o1, d1, a1, 2, key))
    row("C bounce-2", o2, d2, a2.astype(jnp.float32))

    v = jnp.asarray(scene.mesh.vertices)
    lo_, hi_ = jnp.min(v, axis=0), jnp.max(v, axis=0)

    def spatial_sorted(o_, d_, a_):
        q = jnp.clip((o_ - lo_) / jnp.maximum(hi_ - lo_, 1e-6), 0.0, 1.0)
        cell = (q * 15.0).astype(jnp.int32)
        oct_ = ((d_[:, 0] > 0).astype(jnp.int32) * 4
                + (d_[:, 1] > 0).astype(jnp.int32) * 2
                + (d_[:, 2] > 0).astype(jnp.int32))
        k_ = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | oct_
        k_ = jnp.where(a_, k_, jnp.int32(1) << 30)
        p = jnp.argsort(k_, stable=True)
        return o_[p], d_[p], a_[p].astype(jnp.float32)

    o2s, d2s, a2s = jax.block_until_ready(spatial_sorted(o2, d2, a2))
    row("E b2 spatial-sort", o2s, d2s, a2s)
    o1s, d1s, a1s = jax.block_until_ready(spatial_sorted(o1, d1, a1))
    row("G b1 spatial-sort", o1s, d1s, a1s)


if __name__ == "__main__":
    main()
