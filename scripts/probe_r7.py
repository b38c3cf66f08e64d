"""Round-2 probe #7: ROW-granularity compaction vs per-ray argsort.

probe_r6 showed the per-ray argsort+apply costs ~140 ms / 2M rays on v5e —
larger than any post-sort bounce. The traversal unions at BLOCK (8x128)
granularity and dead-block skip acts per block, so reordering whole
128-ray rows (argsort 16k row keys + contiguous row gathers) should keep
the entire benefit at a fraction of the cost.

Measures, on real bounce-1 survivor state of the bench frame:
  - cost of per-ray sort vs row sort (in-pipeline, jitted)
  - bounce-2..4 kernel time after each (coherence preserved?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r7.py
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
from atray_tpu.render.wavefront import (
    BOUNCE_MULTI_POP, _bounce_dir, ray_uniforms, to_tile_order,
)
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080
LANE = 128


def bench(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


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
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera(
        (0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9, aspect=W / H
    )
    key = jax.random.PRNGKey(0)
    N = W * H

    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)

    def keys_of(o, d, alive):
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 15.0).astype(jnp.int32)
        octd = (
            (d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32)
        )
        k = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | octd
        return jnp.where(alive, k, jnp.int32(1) << 30)

    # the full 14-column state a production compact moves
    def mkstate(o, d, alive):
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        w = jax.random.uniform(ks[0], (N, 3), jnp.float32)
        c = jax.random.uniform(ks[1], (N, 3), jnp.float32)
        gid = jnp.arange(N, dtype=jnp.int32)
        return o, d, w, c, alive, gid

    @jax.jit
    def sort_ray(o, d, w, c, alive, gid):
        perm = jnp.argsort(keys_of(o, d, alive), stable=True)
        return (o[perm], d[perm], w[perm], c[perm], alive[perm], gid[perm])

    @jax.jit
    def sort_row(o, d, w, c, alive, gid):
        keys = keys_of(o, d, alive)
        rows = N // LANE
        rperm = jnp.argsort(
            jnp.min(keys.reshape(rows, LANE), axis=1), stable=True
        )

        def take(x):
            return x.reshape((rows, LANE) + x.shape[1:])[rperm].reshape(
                x.shape
            )

        return tuple(take(x) for x in (o, d, w, c, alive, gid))

    def kern(mp):
        return jax.jit(
            lambda o_, d_, al_: wide_shade_first_hit(
                accel, o_, d_, alive=al_, multi_pop=mp
            )
        )

    k_primary = kern(1)
    k_bounce = kern(BOUNCE_MULTI_POP)

    @jax.jit
    def advance(o, d, al, out, b):
        hit = (out["id"] >= 0) & al
        n = out["normal"]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        u = ray_uniforms(key, jnp.arange(N, dtype=jnp.int32), b)
        newd = _bounce_dir(d, n, out["scatter"], u)
        point = o + out["t"][:, None] * d
        o = jnp.where(hit[:, None], point + 1e-3 * n, o)
        d = jnp.where(hit[:, None], newd, d)
        o = jnp.where(hit[:, None], o, 1.0e7)
        d = jnp.where(hit[:, None], d, jnp.asarray([0.0, 0.0, 1.0]))
        return o, d, hit

    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    alive = jnp.ones((N,), bool)
    _, out = bench(k_primary, orig, dirn, alive.astype(jnp.float32))
    o, d, alive = advance(orig, dirn, alive, out, 0)
    _, out = bench(k_bounce, o, d, alive.astype(jnp.float32))
    o, d, alive = advance(o, d, alive, out, 1)
    print(f"post-b1 live={float(jnp.mean(alive)):.4f}")

    st = mkstate(o, d, alive)
    t_ray, st_ray = bench(sort_ray, *st)
    t_row, st_row = bench(sort_row, *st)
    print(f"per-ray sort+apply: {t_ray*1e3:7.1f} ms")
    print(f"row     sort+apply: {t_row*1e3:7.1f} ms")

    for name, s in (("ray", st_ray), ("row", st_row)):
        o2, d2, al2 = s[0], s[1], s[4]
        for b in (2, 3, 4):
            t, out = bench(k_bounce, o2, d2, al2.astype(jnp.float32))
            print(f"  [{name}] b{b}: {t*1e3:7.1f} ms  live={float(jnp.mean(al2)):.4f}")
            o2, d2, al2 = advance(o2, d2, al2, out, b)


if __name__ == "__main__":
    main()
