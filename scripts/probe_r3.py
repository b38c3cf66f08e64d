"""Round-2 probe #3: interleave depth x multi-pop x compaction key.

Workloads (dragon 139k tris + floor plane, the BENCH scene, 2.07M rays):
  A. coherent primaries
  B. real bounce-1 rays (~70% live: floor+dragon hits)
  C. real bounce-2 rays (~8% live — the sparse late-bounce regime where
     every block walks a huge union for a handful of live lanes)
  D. C compacted dead-last STABLE (preserves film-tile origin order —
     the dir-bin major key measured in probe_r2 destroyed it and lost)
  E. C sorted spatial-major (fine origin cell, dir octant minor)

Kernel grid: n_inter in {2, 4} x multi_pop in {1, 4}.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r3.py
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
    grid = [(2, 1), (2, 4), (4, 1), (4, 4)]

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
        (ni, mp): jax.jit(
            lambda o_, d_, a_, ni=ni, mp=mp: wide_shade_first_hit(
                accel, o_, d_, alive=a_, n_inter=ni, multi_pop=mp
            )["t"]
        )
        for (ni, mp) in grid
    }

    def row(label, o_, d_, a_):
        nlive = float(jnp.sum(a_))
        base = None
        for (ni, mp), jk in kernels.items():
            dt = timeit(jk, o_, d_, a_)
            if base is None:
                base = dt
            print(
                f"{label:24s} ni={ni} K={mp}: {dt*1e3:7.1f} ms "
                f"{n/dt/1e6:6.2f} Mwork/s {nlive/dt/1e6:6.2f} Mlive/s "
                f"({base/dt:.2f}x)",
                flush=True,
            )

    ones = jnp.ones((n,), jnp.float32)
    row("A coherent", orig, dirn, ones)

    @jax.jit
    def step(o, d, alive, b, k):
        fo = wide_shade_first_hit(accel, o, d, alive=alive.astype(jnp.float32))
        # fold in the floor plane (the bench scene's second hit class)
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

    o1, d1, a1 = jax.block_until_ready(step(orig, dirn, jnp.ones((n,), bool), 1, key))
    print(f"bounce-1 live: {float(a1.mean()):.3f}", flush=True)
    row("B bounce-1", o1, d1, a1.astype(jnp.float32))

    o2, d2, a2 = jax.block_until_ready(step(o1, d1, a1, 2, key))
    print(f"bounce-2 live: {float(a2.mean()):.3f}", flush=True)
    row("C bounce-2", o2, d2, a2.astype(jnp.float32))

    # D: stable dead-last compaction (film-tile order preserved among live)
    perm = jnp.argsort(~a2, stable=True)
    o2c, d2c, a2c = jax.block_until_ready(
        (o2[perm], d2[perm], a2[perm].astype(jnp.float32)))
    row("D b2 stable-compact", o2c, d2c, a2c)

    # E: spatial-major sort (origin cell fine, direction octant minor)
    v = jnp.asarray(scene.mesh.vertices)
    lo_, hi_ = jnp.min(v, axis=0), jnp.max(v, axis=0)
    q = jnp.clip((o2 - lo_) / jnp.maximum(hi_ - lo_, 1e-6), 0.0, 1.0)
    cell = (q * 15.0).astype(jnp.int32)
    oct_ = ((d2[:, 0] > 0).astype(jnp.int32) * 4
            + (d2[:, 1] > 0).astype(jnp.int32) * 2
            + (d2[:, 2] > 0).astype(jnp.int32))
    k_ = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | oct_
    k_ = jnp.where(a2, k_, jnp.int32(1) << 30)
    perm = jnp.argsort(k_, stable=True)
    o2s, d2s, a2s = jax.block_until_ready(
        (o2[perm], d2[perm], a2[perm].astype(jnp.float32)))
    row("E b2 spatial-sort", o2s, d2s, a2s)

    # the same two treatments for the dense bounce-1 set
    perm = jnp.argsort(~a1, stable=True)
    row("F b1 stable-compact", o1[perm], d1[perm],
        a1[perm].astype(jnp.float32))
    q = jnp.clip((o1 - lo_) / jnp.maximum(hi_ - lo_, 1e-6), 0.0, 1.0)
    cell = (q * 15.0).astype(jnp.int32)
    oct_ = ((d1[:, 0] > 0).astype(jnp.int32) * 4
            + (d1[:, 1] > 0).astype(jnp.int32) * 2
            + (d1[:, 2] > 0).astype(jnp.int32))
    k_ = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | oct_
    k_ = jnp.where(a1, k_, jnp.int32(1) << 30)
    perm = jnp.argsort(k_, stable=True)
    row("G b1 spatial-sort", o1[perm], d1[perm],
        a1[perm].astype(jnp.float32))

    # sort/apply overhead reference (14-column state, the production cost)
    cols = jnp.stack([o2[:, 0]] * 14, axis=1)
    japply = jax.jit(lambda p, c: (jnp.argsort(k_, stable=True), c[p]))
    dt = timeit(lambda: jax.block_until_ready(japply(perm, cols)))
    print(f"argsort+apply(14 cols): {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
