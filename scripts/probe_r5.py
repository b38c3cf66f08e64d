"""Round-2 probe #5: compaction APPLY cost + deeper multi-pop.

The one-shot compaction (render/wavefront.py compact_state) costs
argsort ~26 ms + a 14-column gather ~70 ms per 2M rays (docs/KERNELS.md).
If the apply gets cheap enough, sorting BEFORE the first diffuse bounce
(and even re-sorting later bounces) becomes profitable. Candidates:

  a. argsort(stable) + 14 separate column gathers      (shipped today)
  b. one lax.sort call with 15 operands (key + all state columns) —
     the sort network moves the payload, no gather at all
  c. argsort + gather of ONE packed (N, 16) row matrix (pad 14 -> 16)
  d. b but payload packed as 4 float32 columns via manual interleave? no —
     keep it simple: b vs a vs c.

Also: bounce-1 (dense incoherent) at multi_pop in {4, 8, 12} x n_inter
{2, 4} — the walk is scalar-sync latency-bound, deeper pop batches
amortize further if the stack stays deep enough.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r5.py
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


def bench(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def make_bench_scene():
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
    return scene, accel, cam


def bounce_state(scene, accel, cam, key, n_bounce):
    """Real ray state after ``n_bounce`` diffuse bounces of the bench frame."""
    orig, dirn = camera_rays(cam, W, H, 1)
    orig = to_tile_order(orig, W, H, 1)
    dirn = to_tile_order(dirn, W, H, 1)
    nrays = orig.shape[0]
    ids = jnp.arange(nrays, dtype=jnp.int32)
    alive = jnp.ones((nrays,), bool)
    for b in range(n_bounce):
        out = wide_shade_first_hit(accel, orig, dirn, alive=alive.astype(jnp.float32))
        hit = out["id"] >= 0
        n = out["normal"]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        u = ray_uniforms(key, ids, b)
        newd = _bounce_dir(dirn, n, out["scatter"], u)
        point = orig + out["t"][:, None] * dirn
        orig = jnp.where(hit[:, None], point + 1e-3 * n, orig)
        dirn = jnp.where(hit[:, None], newd, dirn)
        alive = alive & hit
    return orig, dirn, alive


def main():
    dev = jax.devices()[0]
    print(f"device={dev}")
    scene, accel, cam = make_bench_scene()
    key = jax.random.PRNGKey(0)
    N = W * H

    # synthetic full state (values don't matter for sort cost)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    o = jax.random.normal(ks[0], (N, 3), jnp.float32)
    d = jax.random.normal(ks[1], (N, 3), jnp.float32)
    w = jax.random.uniform(ks[2], (N, 3), jnp.float32)
    c = jax.random.uniform(ks[3], (N, 3), jnp.float32)
    al = jax.random.uniform(ks[4], (N,)) < 0.7
    gid = jnp.arange(N, dtype=jnp.int32)
    skey = jax.random.randint(ks[5], (N,), 0, 1 << 20, jnp.int32)
    skey = jnp.where(al, skey, jnp.int32(1) << 30)

    @jax.jit
    def apply_a(skey, o, d, w, c, al, gid):
        perm = jnp.argsort(skey, stable=True)
        return o[perm], d[perm], w[perm], c[perm], al[perm], gid[perm]

    @jax.jit
    def apply_b(skey, o, d, w, c, al, gid):
        ops = (
            [skey]
            + [o[:, i] for i in range(3)]
            + [d[:, i] for i in range(3)]
            + [w[:, i] for i in range(3)]
            + [c[:, i] for i in range(3)]
            + [al, gid]
        )
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        st = lambda a, b_, c_: jnp.stack([a, b_, c_], axis=-1)
        return (
            st(*out[1:4]), st(*out[4:7]), st(*out[7:10]), st(*out[10:13]),
            out[13], out[14],
        )

    @jax.jit
    def apply_c(skey, o, d, w, c, al, gid):
        perm = jnp.argsort(skey, stable=True)
        pack = jnp.concatenate(
            [o, d, w, c, al[:, None].astype(jnp.float32),
             gid[:, None].astype(jnp.float32),
             jnp.zeros((N, 2), jnp.float32)], axis=1)
        sp = pack[perm]
        return (sp[:, 0:3], sp[:, 3:6], sp[:, 6:9], sp[:, 9:12],
                sp[:, 12] > 0.5, sp[:, 13].astype(jnp.int32))

    for name, fn in [("a argsort+14col", apply_a),
                     ("b lax.sort 15op", apply_b),
                     ("c argsort+packed", apply_c)]:
        t, out = bench(fn, skey, o, d, w, c, al, gid)
        print(f"apply {name:>18s}: {t*1e3:7.1f} ms / {N/1e6:.2f}M rays")

    # parity of b vs a on gid (stable => identical permutation)
    ra = apply_a(skey, o, d, w, c, al, gid)
    rb = apply_b(skey, o, d, w, c, al, gid)
    print("b matches a (gid):", bool(jnp.all(ra[5] == rb[5])))

    # --- deeper multi-pop on real bounce-1 rays ---------------------------
    o1, d1, a1 = bounce_state(scene, accel, cam, key, 1)
    o1 = jnp.where(a1[:, None], o1, 1.0e7)
    d1 = jnp.where(a1[:, None], d1, jnp.asarray([0.0, 0.0, 1.0]))
    live = float(jnp.sum(a1)) / N
    print(f"bounce-1 live fraction: {live:.3f}  nodes={accel.num_nodes}")

    for ni in (2,):
        for mp in (4, 8, 12):
            f = jax.jit(
                lambda o_, d_, al_, ni=ni, mp=mp: wide_shade_first_hit(
                    accel, o_, d_, alive=al_, n_inter=ni, multi_pop=mp
                )["t"]
            )
            t, _ = bench(f, o1, d1, a1.astype(jnp.float32))
            print(
                f"b1 ni={ni} K={mp:2d}: {t*1e3:7.1f} ms"
                f"  {N/t/1e6:6.2f} Mwork/s  {live*N/t/1e6:6.2f} Mlive/s"
            )


if __name__ == "__main__":
    main()
