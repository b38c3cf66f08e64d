"""Headline benchmark: rays/sec/chip on the Dragon-tier scene.

Prints ONE JSON line:
  {"metric": "live_rays_per_sec_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N}

Baseline: BASELINE.json's north star is >= 1e9 rays/s on a v4-16 (16 cores)
for Dragon @1080p/64spp -> 6.25e7 rays/s per chip. ``vs_baseline`` is
measured rays/s/chip divided by 6.25e7.

Ray accounting (two numbers, per VERDICT r1 #5):
- live rays ("rays_cast"): paths actually alive entering each bounce — the
  reference's RenderTile.ray_casts counter semantics (renderer.cpp:345,355).
  This is the HEADLINE number.
- work rays: W*H*spp*bounces — every SIMD lane at every bounce, dead or
  alive; reported as ``work_rays_per_sec`` for lane-efficiency context.

Configuration defaults to the full BASELINE config-4 headline
(1920x1080, 64 spp, 5 bounces, 139k-tri dragon proxy), chunked so each
dispatch stays within device memory.

Timing methodology: each timed unit is ONE jitted full-frame render
(hundreds of rays-millions of work), far above the ~24 ms per-dispatch
relay constant of this environment, so wall-clock per frame is honest.

Env knobs (CI bounds): ATRAY_BENCH_SPP, ATRAY_BENCH_RES, ATRAY_BENCH_TRIS,
ATRAY_BENCH_REPS, ATRAY_BENCH_BOUNCES, ATRAY_BENCH_LEAF, ATRAY_BENCH_CHUNK,
ATRAY_BENCH_SORT, ATRAY_BENCH_BWD.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the Mosaic kernels + scanned frame take
# minutes to compile cold; cached recompiles are near-instant across runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ATRAY_JAX_CACHE", os.path.expanduser("~/.cache/jax_atray")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_RAYS_PER_SEC_CHIP = 6.25e7


def run_ladder(configs=None, out_path="BENCH_ladder.json") -> None:
    """Render the BASELINE config ladder (BASELINE.md configs 1-4) and
    write one regenerable artifact: ``python bench.py --ladder``.

    1. Cube.obj,   256x256,  1 spp, single bounce, FLAT intersect (no tree)
    2. Monkey.obj, 512x512,  4 spp, tree traversal + NEE shadow rays
    3. Deer.obj,  1280x720, 16 spp, 3-bounce path trace + compaction
    4. Dragon(139k proxy), 1920x1080, 64 spp, 5 bounces — the headline

    Real assets are used where the reference ships them (Cube/Deer/
    Monkey); Dragon.obj is a missing blob upstream, so config 4 uses the
    139k-tri procedural proxy (file-path parity at this scale is covered
    by tests/test_dragon_file.py). Timing: jitted full-frame dispatches,
    fresh key per rep (the relay caches identical dispatches), best of
    ``reps``; config 4 renders as 8-spp passes like the headline bench.
    """
    import dataclasses

    from atray_tpu.accel.shaded import build_shaded_accel
    from atray_tpu.config import KDTreeConfig, RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.render.wavefront import render
    from atray_tpu.scene import build_scene, load_obj, procedural
    from atray_tpu.scene.data import Planes, Spheres, make_materials
    from atray_tpu.scene.transforms import scale_to, translate, translate_to

    assets = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "assets")
    reps = int(os.environ.get("ATRAY_BENCH_REPS", "2"))
    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),   # sky
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),  # body
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),     # floor
        ((9.0, 8.5, 7.0), (0.0, 0.0, 0.0), 0.0),      # light
    ])
    floor = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    light = Spheres(
        centers=jnp.asarray([[2.5, 3.0, -2.5]], jnp.float32),
        radii=jnp.asarray([0.6], jnp.float32),
        material_id=jnp.asarray([3], jnp.int32),
    )

    def place(mesh):
        return translate_to(scale_to(mesh, 2.4), (0.0, -0.3, -4.0))

    def cfg_scene(n):
        if n == 1:
            mesh = place(load_obj(os.path.join(assets, "Cube.obj")))
            scene = build_scene([mesh], materials=mats)
            st = RenderSettings(resolution=(256, 256), samples_per_pixel=1,
                                bounce_limit=1, sort_bounces=False)
            return scene, st, None, "Cube.obj"
        if n == 2:
            mesh = place(load_obj(os.path.join(assets, "Monkey.obj")))
            scene = build_scene([mesh], planes=floor, spheres=light,
                                materials=mats)
            st = RenderSettings(resolution=(512, 512), samples_per_pixel=4,
                                bounce_limit=3, nee=True)
            return scene, st, "accel", "Monkey.obj"
        if n == 3:
            mesh = place(load_obj(os.path.join(assets, "Deer.obj")))
            scene = build_scene([mesh], planes=floor, materials=mats)
            st = RenderSettings(resolution=(1280, 720), samples_per_pixel=16,
                                bounce_limit=3, sort_bounces=True)
            return scene, st, "accel", "Deer.obj"
        if n == 4:
            mesh = translate(
                procedural.dragon_proxy(target_tris=139_000, material=1),
                (0.0, 0.0, -4.0),
            )
            scene = build_scene([mesh], planes=floor, materials=mats)
            st = RenderSettings(
                resolution=(1920, 1080), samples_per_pixel=8, bounce_limit=5,
                ray_chunk=2 * 1920 * 1080, sort_bounces=True,
            )
            return scene, st, "accel", "dragon_proxy(139k)"
        raise ValueError(n)

    results = []
    for n in configs or (1, 2, 3, 4):
        scene, st, use_accel, asset = cfg_scene(n)
        accel = (build_shaded_accel(scene, KDTreeConfig(leaf_size=16))
                 if use_accel else None)
        w, h = st.resolution
        cam = look_at_camera((0.0, 1.0, 0.8), (0.0, -0.2, -4.0),
                             h_fov=0.9, aspect=w / h)
        n_pass = 8 if n == 4 else 1   # config 4: 64 spp as 8-spp passes
        jf = jax.jit(lambda key, s=scene, c=cam, t=st, a=accel: render(
            s, c, t, key, accel=a, return_stats=True))

        def frame(fkey):
            acc, live = None, []
            for p in range(n_pass):
                film, stats = jf(jax.random.fold_in(fkey, p))
                acc = film if acc is None else acc + film
                live.append(stats["rays_cast"])
            jax.block_until_ready(acc)
            return float(sum(jax.device_get(live)))

        live_rays = frame(jax.random.PRNGKey(0))          # warm/compile
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            frame(jax.random.PRNGKey(i + 1))
            times.append(time.perf_counter() - t0)
        best = min(times)
        per_chip = live_rays / best / jax.device_count()
        row = {
            "config": n,
            "asset": asset,
            "tris": int(scene.mesh.num_faces),
            "resolution": [w, h],
            "spp": st.samples_per_pixel * n_pass,
            "bounces": st.bounce_limit,
            "nee": bool(st.nee),
            "compaction": bool(st.sort_bounces),
            "accel": "shaded_wide" if use_accel else "none (flat)",
            "frame_s": round(best, 4),
            "live_rays": live_rays,
            "live_rays_per_sec_chip": per_chip,
            "vs_chip_baseline": per_chip / BASELINE_RAYS_PER_SEC_CHIP,
        }
        results.append(row)
        print(json.dumps(row))

    artifact = {
        "command": "python bench.py --ladder",
        "device": str(jax.devices()[0]),
        "chips": jax.device_count(),
        "chip_baseline_rays_per_sec": BASELINE_RAYS_PER_SEC_CHIP,
        "configs": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


def main() -> None:
    from atray_tpu.accel.shaded import build_shaded_accel
    from atray_tpu.config import KDTreeConfig, RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.render.wavefront import render
    from atray_tpu.scene import build_scene, procedural
    from atray_tpu.scene.data import Planes, make_materials
    from atray_tpu.scene.transforms import translate

    spp = int(os.environ.get("ATRAY_BENCH_SPP", "64"))
    res = os.environ.get("ATRAY_BENCH_RES", "1920x1080")
    tris = int(os.environ.get("ATRAY_BENCH_TRIS", "139000"))
    reps = int(os.environ.get("ATRAY_BENCH_REPS", "2"))
    bounces = int(os.environ.get("ATRAY_BENCH_BOUNCES", "5"))
    leaf = int(os.environ.get("ATRAY_BENCH_LEAF", "16"))
    sort = os.environ.get("ATRAY_BENCH_SORT", "1") == "1"
    w, h = (int(x) for x in res.split("x"))

    mats = make_materials([
        ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.75, 0.55, 0.35), 0.15),
        ((0.0, 0.0, 0.0), (0.6, 0.6, 0.65), 0.0),
    ])
    t0 = time.perf_counter()
    dragon = translate(
        procedural.dragon_proxy(target_tris=tris, material=1), (0.0, 0.0, -4.0)
    )
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.8], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([dragon], planes=planes, materials=mats)
    t_mesh = time.perf_counter() - t0

    t0 = time.perf_counter()
    accel = build_shaded_accel(scene, KDTreeConfig(leaf_size=leaf))
    t_build = time.perf_counter() - t0

    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9, aspect=w / h)
    chunk = int(os.environ.get("ATRAY_BENCH_CHUNK", str(2 * 1920 * 1080)))
    # The frame renders as spp passes of ``spp_pass`` samples, one dispatch
    # each (keys fold_in(frame_key, pass)) — the axon relay kills single
    # XLA programs running longer than ~60-90 s, and 1080p x 64 spp x 5
    # bounces in one program crosses that. Within a pass, rays go through
    # the lax.map chunk loop as usual. Frame time = sum of pass walls.
    spp_pass = min(spp, int(os.environ.get("ATRAY_BENCH_SPP_PASS", "8")))
    assert spp % spp_pass == 0, "spp must be a multiple of ATRAY_BENCH_SPP_PASS"
    n_pass = spp // spp_pass
    settings = RenderSettings(
        resolution=(w, h), samples_per_pixel=spp_pass, bounce_limit=bounces,
        ray_chunk=chunk, sort_bounces=sort,
        pair_bounces=os.environ.get("ATRAY_BENCH_PAIR", "0") == "1",
    )

    n_chips = jax.device_count()

    jpass = jax.jit(
        lambda key: render(
            scene, cam, settings, key, accel=accel, return_stats=True
        )
    )

    # honest compile accounting: AOT-compile the pass once (compile_s is
    # COMPILE ONLY, not compile + first frame); every dispatch then calls
    # the compiled executable
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    jpass_c = jpass.lower(jax.random.fold_in(key, 0)).compile()
    t_compile = time.perf_counter() - t0

    def frame(frame_key):
        """One full frame = n_pass dispatches; returns (film, live_rays).
        Stats stay device-side until the end (a d2h inside the loop would
        both sync early and degrade later dispatch latency on the relay)."""
        acc = None
        live = []
        for p in range(n_pass):
            film, stats = jpass_c(jax.random.fold_in(frame_key, p))
            acc = film if acc is None else acc + film
            live.append(stats["rays_cast"])
        acc = jax.block_until_ready(acc) / n_pass
        return acc, float(sum(jax.device_get(live)))

    _, live_rays = frame(key)

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        frame(jax.random.PRNGKey(i + 1))
        times.append(time.perf_counter() - t0)
    best = min(times)

    work_rays = w * h * spp * bounces
    live_per_sec = live_rays / best
    work_per_sec = work_rays / best
    per_chip = live_per_sec / n_chips

    # backward/forward time ratio (BASELINE metric) at the dragon tier:
    # 960x540 x 4spp x 3 bounces (VERDICT r1 #4 scale), remat'd scan.
    import dataclasses

    bw_w, bw_h, bw_spp, bw_bounces = 960, 540, 4, 3
    bw_settings = RenderSettings(
        resolution=(bw_w, bw_h), samples_per_pixel=bw_spp,
        bounce_limit=bw_bounces, ray_chunk=0,
    )
    bkey = jax.random.PRNGKey(3)

    # every timed call gets a FRESH key: the relay caches repeat dispatches
    # with identical arguments, which silently turns a re-timing into a
    # no-op (measured 0.5 ms for a full render)
    def fwd(params, k):
        sc = scene.with_params(params)
        return jnp.sum(render(sc, cam, bw_settings, k, accel=accel))

    t_f = t_b = bwd_fwd_ratio = float("nan")
    if os.environ.get("ATRAY_BENCH_BWD", "1") == "1":
        try:
            params = scene.params()
            jf = jax.jit(fwd)
            jg = jax.jit(jax.grad(fwd))
            jf(params, bkey).block_until_ready()
            jax.block_until_ready(jg(params, bkey))

            def timed(fn):
                ts = []
                for i in range(2):
                    k = jax.random.fold_in(bkey, i + 1)
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(params, k))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            t_f = timed(jf)
            t_b = timed(jg)
            bwd_fwd_ratio = t_b / t_f
        except Exception as e:  # report forward perf even if grads fail
            print(f"backward probe failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "live_rays_per_sec_chip",
                "value": per_chip,
                "unit": "rays/s",
                "vs_baseline": per_chip / BASELINE_RAYS_PER_SEC_CHIP,
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "resolution": [w, h],
                    "spp": spp,
                    "bounces": bounces,
                    "tris": int(scene.mesh.num_faces),
                    "wide_nodes": int(accel.num_nodes),
                    "chips": n_chips,
                    "device": str(jax.devices()[0]),
                    "sort_bounces": sort,
                    "mesh_gen_s": round(t_mesh, 3),
                    "bvh_build_s": round(t_build, 3),
                    "compile_s": round(t_compile, 3),
                    "frame_s": round(best, 4),
                    "live_rays": live_rays,
                    "work_rays": work_rays,
                    "live_rays_per_sec": live_per_sec,
                    "work_rays_per_sec": work_per_sec,
                    "backward_forward_ratio": round(bwd_fwd_ratio, 3),
                    "forward_s_960x540x4spp": round(t_f, 4),
                    "backward_s_960x540x4spp": round(t_b, 4),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    if "--ladder" in sys.argv:
        cfgs = [int(a) for a in sys.argv[1:] if a.isdigit()] or None
        run_ladder(cfgs)
    else:
        main()
