"""Round-3 probe #25: the REAL bounce-k state vs the synthetic one.

Chains k true bounces (production kernel + production _bounce_dir /
ray_uniforms respawn, plane folded in) and times the kernel on each
bounce's ENTERING state, amortized 8x per dispatch. If the real b3 state
runs at ~0.7 M rays/s where probe_r24's synthetic state runs at 6 M/s,
late-bounce cost is ray HARDNESS (trapped survivors), not ordering,
occupancy, glue, or launch width.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r25.py
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

W, H = 1920, 1080
N = W * H
K = 8


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
    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    ids = jnp.arange(N, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(o, d, alive, b):
        out = wide_shade_first_hit(accel, o, d, alive=alive, multi_pop=4)
        t_m, n_m = out["t"], out["normal"]
        sc_m = out["scatter"]
        hit_m = out["id"] >= 0
        denom = d @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, -(o @ pn + poff) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t_m
        t = jnp.where(closer, t_p, t_m)
        nrm = jnp.where(closer[:, None], pn, n_m)
        sc = jnp.where(closer, 0.0, sc_m)
        hit = (hit_m | (t_p < 1e29)) & alive
        cos_in = jnp.sum(-d * nrm, axis=1)
        nrm = jnp.where(cos_in[:, None] < 0, -nrm, nrm)
        t_safe = jnp.where(hit, t, 0.0)
        point = o + t_safe[:, None] * d
        u = ray_uniforms(key, ids, b, 3)
        d2 = _bounce_dir(d, nrm, sc, u)
        o2 = jnp.where(hit[:, None], point, 1.0e7)
        d2 = jnp.where(hit[:, None], d2, jnp.asarray([0.0, 0.0, 1.0]))
        return o2, d2, hit

    def bench_state(o, d, a, label):
        n_live = float(jnp.sum(a.astype(jnp.float32)))

        def f(salt):
            def body(i, acc):
                oo = o + (salt + i.astype(jnp.float32)) * 1e-12
                return acc + wide_shade_first_hit(
                    accel, oo, d, alive=a, multi_pop=4)["t"][0]
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        fj = jax.jit(f)
        jax.block_until_ready(fj(jnp.float32(0.5)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fj(jnp.float32(1.0 + i)))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.025) / K
        print(f"{label}: live {n_live/1e3:7.1f}k  kernel {t*1e3:8.2f} ms/op  "
              f"{n_live/t/1e6:6.2f} M live rays/s", flush=True)

    o, d, alive = orig, dirn, jnp.ones((N,), bool)
    for b in range(5):
        bench_state(o, d, alive, f"entering b{b} (real)")
        o, d, alive = step(o, d, alive, b)


if __name__ == "__main__":
    main()
