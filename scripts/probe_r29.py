"""Round-4 probe #29: decompose ONE production bounce at the bench chunk
size (4.15M rays = 2 spp at 1080p).

probe_frame r4 shows a b1 marginal of ~590 ms/chunk while the kernel walk
on the same state measures ~190 ms (probe_r28 scaled) — this probe times
the production bounce_step PIECES in situ on the true b1-entering state:

  kernel       : fused wide_shade call only
  uniforms     : ray_uniforms(key, gid, b) only
  glue         : bounce_step math minus kernel minus uniforms
  sortkey+rows : compact_state's row sort + apply
  lanepack     : compact_state's lane_take pack
  b2 walk      : kernel on the compacted b2 state

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r29.py
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
from atray_tpu.render import wavefront as wf
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

W, H = 1920, 1080
SPP = 2
N = W * H * SPP
K = 4


def timeit(fn, *a, iters=3):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
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
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9,
                         aspect=W / H)
    orig, dirn = camera_rays(cam, W, H, SPP)
    orig = wf.to_tile_order(orig, W, H, SPP)
    dirn = wf.to_tile_order(dirn, W, H, SPP)
    ids = jnp.arange(N, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    # ---- a faithful production bounce_step (fused path, no NEE) --------
    em = scene.materials.emission
    al = scene.materials.albedo
    sc = scene.materials.scatter
    sky = em[0]

    pn = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    poff = jnp.float32(-1.8)

    def hit_block(o, d, alive):
        fo = wide_shade_first_hit(accel, o, d, alive=alive.astype(jnp.float32),
                                  multi_pop=4)
        em_r, al_r, sc_r = wf.resolve_material_rows(
            scene, fo["mat"], fo["id"] >= 0
        )
        t, n, hit = fo["t"], fo["normal"], fo["id"] >= 0
        # merge the floor plane (production _patch_spheres_planes, P=1)
        denom = d @ pn
        t_p = jnp.where(jnp.abs(denom) > 1e-8, (poff - o @ pn) / denom,
                        jnp.float32(1e30))
        t_p = jnp.where(t_p > 1e-4, t_p, jnp.float32(1e30))
        closer = t_p < t
        t = jnp.where(closer, t_p, t)
        n = jnp.where(closer[:, None], pn, n)
        em_r = jnp.where(closer[:, None], em[2], em_r)
        al_r = jnp.where(closer[:, None], al[2], al_r)
        sc_r = jnp.where(closer, sc[2], sc_r)
        hit = hit | closer
        return t, n, hit, em_r, al_r, sc_r

    def glue(o, d, weight, color, alive, gid, t, n, hit, em_r, al_r, sc_r,
             uni):
        miss_now = alive & ~hit
        color = color + jnp.where(miss_now[:, None], weight * sky, 0.0)
        live_hit = alive & hit
        cos_in = jnp.sum(-d * n, axis=1)
        backface = cos_in < 0.0
        n_o = jnp.where(backface[:, None], -n, n)
        atten = jnp.where(backface, 0.0, cos_in)
        color = color + jnp.where(live_hit[:, None], weight * em_r, 0.0)
        t_safe = jnp.where(hit, t, 0.0)
        hit_p = o + t_safe[:, None] * d
        weight = jnp.where(
            live_hit[:, None], weight * al_r * atten[:, None], weight
        )
        new_d = wf._bounce_dir(d, n_o, sc_r, uni[:, 0:3])
        o = jnp.where(live_hit[:, None], hit_p, o)
        d = jnp.where(live_hit[:, None], new_d, d)
        alive = live_hit
        o = jnp.where(alive[:, None], o, 1.0e7)
        d = jnp.where(alive[:, None], d, jnp.asarray([0.0, 0.0, 1.0]))
        return o, d, weight, color, alive

    def full_step(o, d, weight, color, alive, gid, b):
        t, n, hit, em_r, al_r, sc_r = hit_block(o, d, alive)
        uni = wf.ray_uniforms(key, gid, b, 3)
        return glue(o, d, weight, color, alive, gid, t, n, hit,
                    em_r, al_r, sc_r, uni)

    # primary bounce -> b1 state
    w0 = jnp.ones((N, 3))
    c0 = jnp.zeros((N, 3))
    a0 = jnp.ones((N,), bool)
    st1 = jax.jit(full_step, static_argnames="b")(
        orig, dirn, w0, c0, a0, ids, b=0
    )
    o1, d1, w1, c1, a1 = jax.block_until_ready(st1)
    n_live = int(np.asarray(a1).sum())
    print(f"b1 entering: {n_live/1e6:.2f}M live of {N/1e6:.2f}M", flush=True)

    # ---- timings, each amortized K inside one jit ----------------------
    def chain(fn):
        @jax.jit
        def run(o, d, a, g):
            acc = jnp.float32(0.0)
            for i in range(K):
                acc = acc + fn(o + acc * 0.0, d, a, g)
            return acc
        return run

    t_kernel = timeit(chain(
        lambda o, d, a, g: wide_shade_first_hit(
            accel, o, d, alive=a.astype(jnp.float32), multi_pop=4)["t"][0]
    ), o1, d1, a1, ids) / K
    print(f"kernel call      : {t_kernel*1e3:8.1f} ms", flush=True)

    t_uni = timeit(chain(
        lambda o, d, a, g: wf.ray_uniforms(key, g + (o[0, 0] * 0.0
                                                     ).astype(jnp.int32),
                                           1, 3)[0, 0]
    ), o1, d1, a1, ids) / K
    print(f"uniforms         : {t_uni*1e3:8.1f} ms", flush=True)

    @jax.jit
    def step_k(o, d, w, c, a, g):
        acc = jnp.float32(0.0)
        for i in range(K):
            o2, d2, w2, c2, a2 = full_step(o + acc * 0.0, d, w, c, a, g, 1)
            acc = acc + o2[0, 0]
        return acc

    t_full = timeit(step_k, o1, d1, w1, c1, a1, ids) / K
    print(f"full bounce step : {t_full*1e3:8.1f} ms "
          f"(glue+matresolve = {(t_full-t_kernel-t_uni)*1e3:.1f})",
          flush=True)

    # ---- compact + b2 state --------------------------------------------
    st2 = jax.jit(full_step, static_argnames="b")(o1, d1, w1, c1, a1, ids,
                                                  b=1)
    o2, d2, w2, c2, a2 = jax.block_until_ready(st2)
    n2 = int(np.asarray(a2).sum())
    print(f"b2 entering: {n2/1e6:.2f}M live", flush=True)

    state = (o2, d2, w2, c2, a2, ids, jnp.float32(0.0))

    @jax.jit
    def compact_only(o, d, a):
        st = (o, d, w2, c2, a, ids, jnp.float32(0.0))
        (o3, d3, *_), _ = wf_compact(st)
        return o3[0, 0]

    def wf_compact(st):
        # reuse the production compact via trace internals
        import types
        return _compact(st)

    # grab compact_state via a tiny trace_radiance shim: easier to just
    # re-implement with the production helpers
    def _compact(st):
        o, d, weight, color, alive, gid, rc = st
        keys = _sort_key(o, d, alive)
        rows = N // 128
        rperm = jnp.argsort(
            jnp.min(keys.reshape(rows, 128), axis=1), stable=True
        )

        def take(x):
            return x.reshape((rows, 128) + x.shape[1:])[rperm].reshape(x.shape)

        st_r = (take(o), take(d), take(weight), take(color), take(alive),
                take(gid), rc)
        packed, _ = wf._lane_pack_state(st_r)
        return packed, None

    def _sort_key(o, d, alive):
        v = scene.mesh.vertices
        lo = jnp.min(v, axis=0)
        hi = jnp.max(v, axis=0)
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        cell = (q * 63.0).astype(jnp.int32)

        def spread3(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        morton = ((spread3(cell[:, 0]) << 2) | (spread3(cell[:, 1]) << 1)
                  | spread3(cell[:, 2]))
        octd = ((d[:, 0] > 0).astype(jnp.int32) * 4
                + (d[:, 1] > 0).astype(jnp.int32) * 2
                + (d[:, 2] > 0).astype(jnp.int32))
        key_ = (morton << 3) | octd
        return jnp.where(alive, key_, jnp.int32(1) << 30)

    @jax.jit
    def compact_k(o, d, a):
        acc = jnp.float32(0.0)
        for i in range(K):
            st = (o + acc * 0.0, d, w2, c2, a, ids, jnp.float32(0.0))
            packed, _ = _compact(st)
            acc = acc + packed[0][0, 0]
        return acc

    t_comp = timeit(compact_k, o2, d2, a2) / K
    print(f"compact (sort+pack): {t_comp*1e3:8.1f} ms", flush=True)

    packed, _ = jax.jit(lambda o, d, a: _compact(
        (o, d, w2, c2, a, ids, jnp.float32(0.0))))(o2, d2, a2)
    po, pd, pw, pc, pa, pg, _ = jax.block_until_ready(packed)

    t_b2k = timeit(chain(
        lambda o, d, a, g: wide_shade_first_hit(
            accel, o, d, alive=a.astype(jnp.float32), multi_pop=4)["t"][0]
    ), po, pd, pa, pg) / K
    print(f"b2 kernel (packed): {t_b2k*1e3:8.1f} ms "
          f"({n2/t_b2k/1e6:.1f} M live/s)", flush=True)

    @jax.jit
    def b2step_k(o, d, w, c, a, g):
        acc = jnp.float32(0.0)
        for i in range(K):
            o3, d3, w3, c3, a3 = full_step(o + acc * 0.0, d, w, c, a, g, 2)
            acc = acc + o3[0, 0]
        return acc

    t_b2full = timeit(b2step_k, po, pd, pw, pc, pa, pg) / K
    print(f"b2 full step     : {t_b2full*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
