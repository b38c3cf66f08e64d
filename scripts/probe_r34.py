"""Round-5 probe #34: where the BACKWARD pass actually spends its time.

Device-profiles jax.grad of the bench backward config (960x540 x 4 spp x
3 bounces, dragon+floor 139k) and aggregates the perfetto trace by op
name — the reverse-mode twin of probe_r10's forward census. Drives the
bwd/fwd <= 1.5 work (VERDICT r4 next #2).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_r34.py
"""

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ATRAY_JAX_CACHE", os.path.expanduser("~/.cache/jax_atray")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from atray_tpu.accel.shaded import build_shaded_accel
from atray_tpu.config import KDTreeConfig, RenderSettings
from atray_tpu.core.camera import look_at_camera
from atray_tpu.render.wavefront import render
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

TRACE_DIR = "/tmp/atray_trace_r34"


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
        (0.0, 1.0, 0.8), (0.0, 0.0, -4.0), h_fov=0.9, aspect=960 / 540
    )
    s = RenderSettings(resolution=(960, 540), samples_per_pixel=4,
                       bounce_limit=3, ray_chunk=0)
    bkey = jax.random.PRNGKey(3)

    def fwd(params, k):
        return jnp.sum(render(scene.with_params(params), cam, s, k,
                              accel=accel))

    params = scene.params()
    jg = jax.jit(jax.grad(fwd))
    jax.block_until_ready(jg(params, bkey))
    t0 = time.perf_counter()
    jax.block_until_ready(jg(params, jax.random.fold_in(bkey, 1)))
    print(f"warm grad: {(time.perf_counter()-t0)*1e3:.1f} ms")

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR, create_perfetto_trace=True):
        jax.block_until_ready(jg(params, jax.random.fold_in(bkey, 2)))

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    assert paths, "no perfetto trace written"
    with gzip.open(paths[-1], "rt") as fh:
        tr = json.load(fh)

    by_name = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3
        by_name[name] += dur
        counts[name] += 1
        total += dur
    print(f"\ntop ops by accumulated duration (total {total:.1f} ms incl. "
          f"overlapping rows):")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {dur:9.2f} ms x{counts[name]:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
