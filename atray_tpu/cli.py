"""Command-line driver: config-file scene authoring + rendering.

Replaces the reference's hardcoded in-code scene authoring and Win32 UI
(app.cpp:59-262, SURVEY.md §2 #22): scenes are TOML files, every
RenderSettings/KDTreeConfig knob is a flag, progress streams to stderr,
output is PNG. Subcommands:

  atray render scene.toml [-o out.png] [--spp N] [--res WxH]
        [--progressive TOTAL_SPP --checkpoint ck.npz] [--srgb] [--seed S]
  atray info
  atray bench

Scene TOML (see examples/cornell.toml):
  [render]    resolution/samples_per_pixel/bounce_limit/anti_aliasing/...
  [accel]     leaf_size / sah_bins / max_depth
  [camera]    eye / look_at / h_fov
  [[materials]]  name + emission + albedo + scatter  (first entry = skybox)
  [[meshes]]     obj = path  OR  procedural = cube|uv_sphere|dragon
                 + material, translate_to, scale_to, smooth, rows/cols/tris
  [[spheres]]    center + radius + material
  [[planes]]     normal + offset + material
"""

from __future__ import annotations

import argparse
import sys
import time
import tomllib
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def load_scene_file(path: str):
    """Parse a scene TOML into (scene, camera, settings, accel_cfg)."""
    from atray_tpu.config import KDTreeConfig, RenderSettings
    from atray_tpu.core.camera import look_at_camera
    from atray_tpu.scene import build_scene, load_obj, procedural
    from atray_tpu.scene.data import Planes, Spheres, make_materials
    from atray_tpu.scene.transforms import scale_to, translate_to

    with open(path, "rb") as fh:
        doc = tomllib.load(fh)

    rcfg = doc.get("render", {})
    settings = RenderSettings(
        resolution=tuple(rcfg.get("resolution", (1280, 720))),
        samples_per_pixel=int(rcfg.get("samples_per_pixel", 5)),
        bounce_limit=int(rcfg.get("bounce_limit", 5)),
        anti_aliasing=bool(rcfg.get("anti_aliasing", False)),
        sort_bounces=bool(rcfg.get("sort_bounces", False)),
        ray_chunk=int(rcfg.get("ray_chunk", 0)),
    )
    acfg = doc.get("accel", {})
    accel_cfg = KDTreeConfig(
        leaf_size=int(acfg.get("leaf_size", 16)),
        sah_bins=int(acfg.get("sah_bins", 16)),
        max_depth=int(acfg.get("max_depth", 40)),
    )

    mat_rows = []
    mat_index: Dict[str, int] = {}
    for i, m in enumerate(doc.get("materials", [])):
        mat_index[m.get("name", f"material_{i}")] = i
        mat_rows.append(
            (
                tuple(m.get("emission", (0.0, 0.0, 0.0))),
                tuple(m.get("albedo", (0.0, 0.0, 0.0))),
                float(m.get("scatter", 0.0)),
            )
        )
    if not mat_rows:
        mat_rows = [((0.3, 0.4, 0.6), (0, 0, 0), 0.0),
                    ((0.0, 0.0, 0.0), (0.7, 0.7, 0.7), 0.0)]
        mat_index = {"sky": 0, "default": 1}
    materials = make_materials(mat_rows)

    def mat_id(name, default=1):
        return mat_index.get(name, default)

    meshes = []
    for m in doc.get("meshes", []):
        mid = mat_id(m.get("material", ""), 1)
        if "obj" in m:
            mesh = load_obj(m["obj"], default_material=mid)
        else:
            kind = m.get("procedural", "cube")
            if kind == "cube":
                mesh = procedural.cube(
                    size=float(m.get("size", 2.0)), material=mid,
                    smooth=bool(m.get("smooth", False)),
                )
            elif kind == "uv_sphere":
                mesh = procedural.uv_sphere(
                    rows=int(m.get("rows", 32)), cols=int(m.get("cols", 32)),
                    radius=float(m.get("radius", 1.0)), material=mid,
                    smooth=bool(m.get("smooth", True)),
                )
            elif kind == "dragon":
                mesh = procedural.dragon_proxy(
                    target_tris=int(m.get("tris", 139000)), material=mid,
                    smooth=bool(m.get("smooth", True)),
                )
            else:
                raise ValueError(f"unknown procedural mesh {kind!r}")
        if "scale_to" in m:
            mesh = scale_to(mesh, float(m["scale_to"]))
        if "translate_to" in m:
            mesh = translate_to(mesh, m["translate_to"])
        meshes.append(mesh)

    sph = doc.get("spheres", [])
    spheres = None
    if sph:
        from atray_tpu.scene.data import Spheres

        spheres = Spheres(
            centers=jnp.asarray([s["center"] for s in sph], jnp.float32),
            radii=jnp.asarray([s["radius"] for s in sph], jnp.float32),
            material_id=jnp.asarray(
                [mat_id(s.get("material", "")) for s in sph], jnp.int32
            ),
        )
    pln = doc.get("planes", [])
    planes = None
    if pln:
        from atray_tpu.scene.data import Planes

        normals = np.asarray([p["normal"] for p in pln], np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        planes = Planes(
            normals=jnp.asarray(normals),
            offsets=jnp.asarray([p["offset"] for p in pln], jnp.float32),
            material_id=jnp.asarray(
                [mat_id(p.get("material", "")) for p in pln], jnp.int32
            ),
        )

    scene = build_scene(meshes, spheres=spheres, planes=planes, materials=materials)

    ccfg = doc.get("camera", {})
    w, h = settings.resolution
    camera = look_at_camera(
        ccfg.get("eye", (0.0, 1.0, 1.0)),
        ccfg.get("look_at", (0.0, 0.0, -4.0)),
        h_fov=float(ccfg.get("h_fov", 0.9)),
        aspect=w / h,
    )
    return scene, camera, settings, accel_cfg


def cmd_render(args) -> int:
    import dataclasses

    from atray_tpu.accel.wide import make_accel
    from atray_tpu.render.film import save_png
    from atray_tpu.render.progressive import render_progressive
    from atray_tpu.render.wavefront import render
    from atray_tpu.utils.profiling import Phase, phase_report

    with Phase("load"):
        scene, camera, settings, accel_cfg = load_scene_file(args.scene)
        if args.spp:
            settings = dataclasses.replace(settings, samples_per_pixel=args.spp)
        if args.res:
            w, h = (int(x) for x in args.res.split("x"))
            settings = dataclasses.replace(settings, resolution=(w, h))
    print(
        f"scene: {scene.mesh.num_faces} tris, {scene.spheres.count} spheres, "
        f"{scene.planes.count} planes; {settings.width}x{settings.height} "
        f"@ {settings.samples_per_pixel}spp x{settings.bounce_limit} bounces",
        file=sys.stderr,
    )
    with Phase("accel_build"):
        accel = (
            make_accel(scene.mesh.vertices, scene.mesh.faces, accel_cfg)
            if scene.mesh.num_faces > 0 and settings.use_accel
            else None
        )

    if args.progressive:
        def on_batch(state):
            print(
                f"  batch {state.batches_done}: {state.spp_total} spp total",
                file=sys.stderr,
            )

        with Phase("render", block=True):
            state = render_progressive(
                scene, camera, settings, total_spp=args.progressive,
                accel=accel, seed=args.seed,
                checkpoint_path=args.checkpoint, on_batch=on_batch,
            )
        film = state.film()
    else:
        key = jax.random.PRNGKey(args.seed)
        with Phase("compile"):
            jrender = jax.jit(
                lambda k: render(scene, camera, settings, k, accel=accel)
            )
            jrender.lower(key).compile()
        with Phase("render", block=True):
            film = np.asarray(jrender(key))

    with Phase("save"):
        path = save_png(args.output, film, srgb=args.srgb)
    rays = (
        settings.width * settings.height * settings.samples_per_pixel
        * settings.bounce_limit
    )
    print(phase_report(rays=rays), file=sys.stderr)
    print(path)
    return 0


def cmd_info(args) -> int:
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for d in jax.devices():
        print(f"  {d}")
    print(f"process {jax.process_index()} / {jax.process_count()}")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="atray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a TOML scene to PNG")
    pr.add_argument("scene")
    pr.add_argument("-o", "--output", default="out.png")
    pr.add_argument("--spp", type=int, default=0)
    pr.add_argument("--res", default="")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--srgb", action="store_true")
    pr.add_argument("--progressive", type=int, default=0,
                    help="total spp rendered in batches of render.samples_per_pixel")
    pr.add_argument("--checkpoint", default=None,
                    help="npz checkpoint path for progressive resume")
    pr.set_defaults(fn=cmd_render)

    pi = sub.add_parser("info", help="show devices / runtime info")
    pi.set_defaults(fn=cmd_info)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
