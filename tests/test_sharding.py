"""Multi-device SPMD tests on the 8-way virtual CPU mesh
(SURVEY.md §4 item 4): sharded render correctness, psum'd gradients, and
the driver dry-run hooks."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from atray_tpu.accel.bvh import build_bvh
from atray_tpu.config import KDTreeConfig, RenderSettings
from atray_tpu.core.camera import camera_rays, look_at_camera
from atray_tpu.dist.mesh import make_device_mesh, render_sharded
from atray_tpu.dist.train import make_loss_and_grad, make_train_step
from atray_tpu.render.wavefront import render
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import make_materials
from atray_tpu.scene.transforms import translate

MATS = make_materials([
    ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
    ((0.0, 0.0, 0.0), (0.8, 0.5, 0.3), 0.2),
])


def _scene():
    mesh = translate(procedural.uv_sphere(rows=10, cols=10, material=1), (0, 0, -4))
    return build_scene([mesh], materials=MATS)


def test_sharded_matches_single_device_multibounce_bitexact(devices):
    # Layout-invariant PRNG (key = f(global ray id, bounce), wavefront.
    # ray_uniforms): the MULTIBOUNCE stochastic sharded render must equal
    # the single-device render bit-for-bit on the 8-way mesh — SURVEY.md §7
    # hard part 5 (the reference's rdtsc*tid seeding is the anti-pattern).
    scene = _scene()
    cam = look_at_camera((0, 0.4, 0.6), (0, 0, -4), h_fov=0.9, aspect=1.0)
    s = RenderSettings(resolution=(16, 16), samples_per_pixel=2, bounce_limit=3)
    mesh = make_device_mesh()
    assert mesh.devices.size == 8
    film_sh = render_sharded(scene, cam, s, jax.random.PRNGKey(0), mesh)
    film_lo = render(scene, cam, s, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(film_sh), np.asarray(film_lo))
    assert np.asarray(film_lo).std() > 0.01


def test_sharded_bitexact_with_nee_and_chunking(devices):
    # The unified renderer honors NEE + chunking under shard_map and stays
    # bit-identical to the single-device whole-frame run.
    import jax.numpy as jnp
    from atray_tpu.scene.data import Spheres

    mesh_body = translate(
        procedural.uv_sphere(rows=8, cols=8, material=1), (0, 0, -4)
    )
    mats = make_materials([
        ((0.05, 0.05, 0.08), (0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0), (0.8, 0.5, 0.3), 0.2),
        ((6.0, 5.0, 4.0), (0.0, 0.0, 0.0), 0.0),
    ])
    spheres = Spheres(
        centers=jnp.asarray([[1.5, 2.0, -3.0]], jnp.float32),
        radii=jnp.asarray([0.5], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([mesh_body], spheres=spheres, materials=mats)
    cam = look_at_camera((0, 0.4, 0.6), (0, 0, -4), h_fov=0.9, aspect=1.0)
    s = RenderSettings(
        resolution=(12, 12), samples_per_pixel=2, bounce_limit=3,
        nee=True, ray_chunk=72,
    )
    dmesh = make_device_mesh()
    film_sh = render_sharded(scene, cam, s, jax.random.PRNGKey(5), dmesh)
    film_lo = render(scene, cam, s, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(film_sh), np.asarray(film_lo))


def test_sharded_multibounce_runs_and_is_reproducible(devices):
    scene = _scene()
    cam = look_at_camera((0, 0.4, 0.6), (0, 0, -4), h_fov=0.9, aspect=1.0)
    # 18x18 px: 324 rays pad to 328 over 8 devices — exercises padding
    s = RenderSettings(resolution=(18, 18), samples_per_pixel=2, bounce_limit=3)
    mesh = make_device_mesh()
    f1 = render_sharded(scene, cam, s, jax.random.PRNGKey(3), mesh)
    f2 = render_sharded(scene, cam, s, jax.random.PRNGKey(3), mesh)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.asarray(f1).std() > 0.01


def test_psum_grads_match_local_grads(devices):
    # Gradient all-reduce over the mesh must equal the single-device grad
    # of the identical global loss — at MULTIBOUNCE (stochastic) depth,
    # because the uniform streams are keyed by global ray id and therefore
    # layout-invariant (VERDICT r1 weak #5 fix).
    scene = _scene()
    bvh = build_bvh(scene.mesh.vertices, scene.mesh.faces, KDTreeConfig())
    cam = look_at_camera((0, 0.4, 0.6), (0, 0, -4), h_fov=0.9, aspect=1.0)
    w = h = 16
    orig, dirn = camera_rays(cam, w, h, spp=1)
    target = jnp.zeros_like(orig)
    mesh = make_device_mesh()
    key = jax.random.PRNGKey(0)

    lg = make_loss_and_grad(scene, bounce_limit=2, mesh=mesh, accel=bvh)
    loss_sh, grads_sh = jax.jit(lg)(scene.params(), orig, dirn, target, key)

    from atray_tpu.render.wavefront import trace_radiance

    def local_loss(p):
        sc = scene.with_params(p)
        color = trace_radiance(sc, orig, dirn, 2, key=key, accel=bvh)
        return jnp.sum((color - target) ** 2) / (3.0 * orig.shape[0])

    loss_lo, grads_lo = jax.value_and_grad(local_loss)(scene.params())
    np.testing.assert_allclose(float(loss_sh), float(loss_lo), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_sh), jax.tree_util.tree_leaves(grads_lo)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_reduces_loss(devices):
    # A few optimization steps on albedo against a rendered target must
    # reduce the pixel loss (tiny inverse-rendering smoke test).
    scene = _scene()
    cam = look_at_camera((0, 0.4, 0.6), (0, 0, -4), h_fov=0.9, aspect=1.0)
    w = h = 8
    orig, dirn = camera_rays(cam, w, h, spp=1)
    mesh = make_device_mesh()
    key = jax.random.PRNGKey(0)

    # Albedo only affects the image from the second bounce on (it scales
    # the weight that multiplies later emission), so train with 2 bounces.
    # Target comes through the SAME sharded trace (same per-shard fold_in
    # streams) so loss at the true params is exactly zero.
    from atray_tpu.dist.mesh import trace_sharded

    target = trace_sharded(scene, orig, dirn, 2, key, mesh)

    # perturb the albedo, then recover it (optimize albedo only, so the
    # landscape stays smooth — moving vertices changes visibility, which is
    # intentionally non-differentiable).
    p0 = scene.params()
    import dataclasses

    from atray_tpu.scene.data import SceneParams

    p = dataclasses.replace(p0, albedo=p0.albedo * 0.3 + 0.1)
    labels = SceneParams(
        vertices="frozen", normals="frozen", emission="frozen",
        albedo="train", scatter="frozen",
    )
    opt = optax.multi_transform(
        {"train": optax.adam(5e-2), "frozen": optax.set_to_zero()}, labels
    )
    step = jax.jit(make_train_step(scene, 2, opt, mesh))
    opt_state = opt.init(p)
    losses = []
    for i in range(60):
        p, opt_state, loss = step(p, opt_state, orig, dirn, target, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.25, losses


def test_graft_entry_single_chip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (128, 128, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_graft_dryrun_multichip(devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_inverse_render_example_converges(devices):
    # BASELINE config 5 (scaled): multi-view inverse rendering with sharded
    # rays + psum'd grads recovers the perturbed albedo
    import runpy

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    saved = sys.argv
    try:
        sys.argv = ["inverse_render.py", "--views", "2", "--res", "12",
                    "--tris", "500", "--steps", "30"]
        with redirect_stdout(buf):
            runpy.run_path("examples/inverse_render.py", run_name="__main__")
    except SystemExit:
        pass
    finally:
        sys.argv = saved
    out = buf.getvalue()
    lines = [l for l in out.splitlines() if l.startswith("step")]
    first = float(lines[0].split("loss")[1].split()[0])
    last = float(lines[-1].split("loss")[1].split()[0])
    assert last < first * 0.5, out


def test_sharded_matches_local_with_texture_and_area_light(devices):
    # round-5 shading features under shard_map: UV texture modulation and
    # emissive-triangle NEE must be bit-identical sharded vs local
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_render_oracle import _area_light_scene, _textured_scene

    mesh = make_device_mesh()
    cam = look_at_camera((0.0, 0.6, 0.5), (0.0, -0.2, -4.0), h_fov=0.9,
                         aspect=4 / 3)
    for scene, nee in ((_textured_scene(), False),
                       (_area_light_scene(), True)):
        st = RenderSettings(resolution=(32, 24), samples_per_pixel=2,
                            bounce_limit=3, nee=nee, sort_bounces=False)
        key = jax.random.PRNGKey(11)
        f_local = np.asarray(render(scene, cam, st, key))
        f_shard = np.asarray(render(scene, cam, st, key, mesh=mesh))
        np.testing.assert_array_equal(f_shard, f_local)
