"""Headline benchmark: rays/sec/chip on the Dragon-tier scene.

Prints ONE JSON line:
  {"metric": "rays_per_sec_chip", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: BASELINE.json's north star is >= 1e9 rays/s on a v4-16 (16 cores)
for Dragon @1080p/64spp -> 6.25e7 rays/s per chip. ``vs_baseline`` is
measured rays/s/chip divided by 6.25e7.

Ray accounting matches what the machine does (and the reference's
ray_casts counter semantics, renderer.cpp:345,355): one "ray" = one
cast/bounce-step traced through the scene; the wavefront processes every
lane at every bounce (no compaction yet), so rays = R_primary * bounces.

Timing methodology: each timed unit is ONE jitted full-frame render
(tens of rays-millions of work), far above the ~24 ms per-dispatch relay
constant of this environment (see .claude/skills/verify/SKILL.md), so
wall-clock per frame is honest.

Env knobs (CI bounds): ATRAY_BENCH_SPP, ATRAY_BENCH_RES, ATRAY_BENCH_TRIS,
ATRAY_BENCH_REPS, ATRAY_BENCH_BOUNCES, ATRAY_BENCH_LEAF.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC_CHIP = 6.25e7


def main() -> None:
    from atray_tpu.accel.wide import make_accel
    from atray_tpu.config import KDTreeConfig, RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.render.wavefront import render
    from atray_tpu.scene import build_scene, procedural
    from atray_tpu.scene.data import Planes, make_materials
    from atray_tpu.scene.transforms import translate

    spp = int(os.environ.get("ATRAY_BENCH_SPP", "4"))
    res = os.environ.get("ATRAY_BENCH_RES", "1920x1080")
    tris = int(os.environ.get("ATRAY_BENCH_TRIS", "139000"))
    reps = int(os.environ.get("ATRAY_BENCH_REPS", "3"))
    bounces = int(os.environ.get("ATRAY_BENCH_BOUNCES", "5"))
    leaf = int(os.environ.get("ATRAY_BENCH_LEAF", "16"))
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
    accel = make_accel(
        scene.mesh.vertices, scene.mesh.faces, KDTreeConfig(leaf_size=leaf)
    )
    t_build = time.perf_counter() - t0

    cam = look_at_camera((0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9, aspect=w / h)
    chunk = int(os.environ.get("ATRAY_BENCH_CHUNK", str(2 * 1920 * 1080)))
    settings = RenderSettings(
        resolution=(w, h), samples_per_pixel=spp, bounce_limit=bounces,
        ray_chunk=chunk,
    )

    n_chips = jax.device_count()

    jframe = jax.jit(
        lambda key: render(scene, cam, settings, key, accel=accel)
    )
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    jframe(key).block_until_ready()
    t_compile = time.perf_counter() - t0

    times = []
    for i in range(reps):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        jframe(k).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)

    rays = w * h * spp * bounces
    rays_per_sec = rays / best
    per_chip = rays_per_sec / n_chips

    # backward/forward time ratio (BASELINE metric) on a reduced config so
    # the grad graph compiles quickly; grads flow to vertices/normals/
    # materials through the detached-visibility convention.
    import dataclasses

    from atray_tpu.render.wavefront import trace_radiance
    from atray_tpu.core.camera import camera_rays

    bw_bounces = min(bounces, 2)   # keep the grad graph's compile bounded
    bw_w, bw_h, bw_spp = 320, 180, 1
    orig, dirn = camera_rays(cam, bw_w, bw_h, bw_spp)
    key = jax.random.PRNGKey(3)

    def fwd(params):
        sc = scene.with_params(params)
        return jnp.sum(
            trace_radiance(sc, orig, dirn, bw_bounces, key=key, accel=accel)
        )

    t_f = t_b = bwd_fwd_ratio = float("nan")
    if os.environ.get("ATRAY_BENCH_BWD", "1") == "1":
        try:
            params = scene.params()
            jf = jax.jit(fwd)
            jg = jax.jit(jax.grad(fwd))
            jf(params).block_until_ready()
            jax.block_until_ready(jg(params))
            t0 = time.perf_counter()
            jf(params).block_until_ready()
            t_f = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(jg(params))
            t_b = time.perf_counter() - t0
            bwd_fwd_ratio = t_b / t_f
        except Exception as e:  # report forward perf even if grads fail
            print(f"backward probe failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "rays_per_sec_chip",
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
                    "mesh_gen_s": round(t_mesh, 3),
                    "bvh_build_s": round(t_build, 3),
                    "compile_s": round(t_compile, 3),
                    "frame_s": round(best, 4),
                    "total_rays_per_sec": rays_per_sec,
                    "backward_forward_ratio": round(bwd_fwd_ratio, 3),
                    "forward_s_320x180": round(t_f, 4),
                    "backward_s_320x180": round(t_b, 4),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
