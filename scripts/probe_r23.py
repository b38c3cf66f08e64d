"""Round-3 probe #23 (block_sub sweep on the late-bounce state): the late-bounce (trapped-survivor) state.

probe_r13 localized the frame tail to LIVE late-bounce pairs: ~2-3 ms per
live pair — their rows share an origin cell (one-shot sort) but their
directions were resampled at every bounce, so each block's traversal
union approaches the whole tree and the leaf phase dominates.

Synthesizes that state (sparse sorted live prefix, shared-origin rows,
uniformly random directions) and sweeps the kernel knobs that could cut
union cost per live pair:
  - octant_split (8 masked passes, union per octant)
  - multi_pop 1/4
  - ordered on/off

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r14.py
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
    ids = jnp.arange(N, dtype=jnp.int32)

    # b1 hit points as origins, like probe_r12
    @jax.jit
    def b0_state():
        out = wide_shade_first_hit(accel, orig, dirn)
        t_m, n_m = out["t"], out["normal"]
        hit_m = out["id"] >= 0
        denom = dirn @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, -(orig @ pn + poff) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t_m
        t = jnp.where(closer, t_p, t_m)
        n = jnp.where(closer[:, None], pn, n_m)
        hit = hit_m | (t_p < 1e29)
        t_safe = jnp.where(hit, t, 0.0)
        point = orig + t_safe[:, None] * dirn
        return point, n, hit

    point, nrm, hit = b0_state()

    # trapped-survivor synth: keep 5% of hit rays alive, origins = hit
    # points (sorted below), directions = fresh hemisphere-random around
    # the local normal (a bounce-4 ray has been resampled 4x: effectively
    # no direction coherence with its row neighbors)
    rng = np.random.default_rng(1)
    keep = jnp.asarray(rng.random(N) < 0.05) & hit
    u = ray_uniforms(jax.random.PRNGKey(9), ids, 7)
    d_new = _bounce_dir(dirn, nrm, jnp.zeros((N,)), u)
    o_new = jnp.where(keep[:, None], point + 1e-3 * nrm, 1.0e7)
    d_new = jnp.where(keep[:, None], d_new, jnp.asarray([0.0, 0.0, 1.0]))

    # spatial row sort (production compaction key)
    v = np.asarray(scene.mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    rows = N // 128

    @jax.jit
    def sort_rows(o, d, a):
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 15.0).astype(jnp.int32)
        octd = ((d[:, 0] > 0).astype(jnp.int32) * 4
                + (d[:, 1] > 0).astype(jnp.int32) * 2
                + (d[:, 2] > 0).astype(jnp.int32))
        k = (((cell[:, 0] << 4 | cell[:, 1]) << 4 | cell[:, 2]) << 3) | octd
        k = jnp.where(a, k, jnp.int32(1) << 30)
        rp = jnp.argsort(jnp.min(k.reshape(rows, 128), axis=1), stable=True)
        tk = lambda x: x.reshape((rows, 128) + x.shape[1:])[rp].reshape(x.shape)
        return tk(o), tk(d), tk(a.astype(jnp.float32))

    o_s, d_s, a_s = sort_rows(o_new, d_new, keep)
    n_live = float(jnp.sum(a_s))
    pad = (-N) % 2048
    a_p = jnp.concatenate([a_s, jnp.zeros((pad,), a_s.dtype)])
    live_pairs = int(np.ceil(float(jnp.sum(
        jnp.max(a_p.reshape(-1, 2048), axis=1)))))
    print(f"late-bounce synth: {n_live:.0f} live rays, "
          f"~{live_pairs} live pairs of {rows // 16}")

    for label, kw in [
        ("K=4 bs=8 ni=2 (prod)   ", dict(multi_pop=4)),
        ("K=4 bs=4 ni=4          ", dict(multi_pop=4, block_sub=4, n_inter=4)),
        ("K=4 bs=2 ni=8          ", dict(multi_pop=4, block_sub=2, n_inter=8)),
        ("K=4 bs=1 ni=8          ", dict(multi_pop=4, block_sub=1, n_inter=8)),
        ("K=8 bs=1 ni=8          ", dict(multi_pop=8, block_sub=1, n_inter=8)),
        ("K=8 bs=1 ni=16         ", dict(multi_pop=8, block_sub=1, n_inter=16)),
        ("K=4 bs=1 ni=8 unord    ", dict(multi_pop=4, block_sub=1, n_inter=8, ordered=False)),
    ]:
        f = jax.jit(lambda o, d, a, kw=kw: wide_shade_first_hit(
            accel, o, d, alive=a, **kw)["t"])
        try:
            t = bench(f, o_s, d_s, a_s)
            print(f"{label}: {t*1e3:7.1f} ms  "
                  f"{t*1e3/max(live_pairs,1):6.3f} ms/live-pair")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
