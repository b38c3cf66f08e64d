"""Gradient correctness (SURVEY.md §4 item 3, BASELINE 'grad allclose').

The renderer's convention is detached visibility: which primitive a ray
hits is non-differentiable (stop_gradient in nearest_hit_ids); t/u/v,
normals, and shading are differentiable. Finite differences agree with
jax.grad as long as the perturbation does not flip any nearest-hit
decision — tests choose stable configurations (interior hits, small eps).

The FD oracle is tests/oracle.py (independent numpy implementation)
consuming the same explicit uniforms, evaluated at theta +/- eps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from atray_tpu.config import RenderSettings
from atray_tpu.core.camera import camera_rays, look_at_camera
from atray_tpu.render.wavefront import draw_bounce_uniforms, render, trace_radiance
from atray_tpu.scene import build_scene, procedural
from atray_tpu.scene.data import Planes, make_materials
from atray_tpu.scene.transforms import translate

MATS = make_materials([
    ((0.35, 0.45, 0.65), (0.0, 0.0, 0.0), 0.0),
    ((0.1, 0.05, 0.0), (0.7, 0.5, 0.3), 0.2),
    ((0.0, 0.0, 0.0), (0.5, 0.6, 0.7), 0.0),
])


def _setup(bounces=3, w=12, h=12):
    body = translate(procedural.uv_sphere(rows=10, cols=10, material=1), (0, 0, -4))
    planes = Planes(
        normals=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        offsets=jnp.asarray([-1.5], jnp.float32),
        material_id=jnp.asarray([2], jnp.int32),
    )
    scene = build_scene([body], planes=planes, materials=MATS)
    cam = look_at_camera((0, 0.3, 0.5), (0, 0, -4), h_fov=0.8, aspect=w / h)
    orig, dirn = camera_rays(cam, w, h, spp=1)
    uni = draw_bounce_uniforms(jax.random.PRNGKey(7), bounces, orig.shape[0])
    return scene, orig, dirn, uni, bounces


def _loss_fn(scene, orig, dirn, uni, bounces):
    def loss(params):
        sc = scene.with_params(params)
        color = trace_radiance(sc, orig, dirn, bounces, uniforms=uni)
        return jnp.sum(color * jnp.cos(jnp.arange(color.size).reshape(color.shape)))

    return loss


def _fd(f, x, eps):
    """Central finite difference of scalar f at every element of x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        g[idx] = (f(xp) - f(xm)) / (2 * eps)
    return g


class TestMaterialGradients:
    def test_albedo_grad_matches_fd(self):
        scene, orig, dirn, uni, bounces = _setup()
        loss = _loss_fn(scene, orig, dirn, uni, bounces)
        p0 = scene.params()
        g = jax.grad(loss)(p0)

        def f_alb(alb):
            p = dataclasses.replace(p0, albedo=jnp.asarray(alb, jnp.float32))
            return float(loss(p))

        fd = _fd(f_alb, p0.albedo, 2e-3)
        np.testing.assert_allclose(np.asarray(g.albedo), fd, atol=3e-2, rtol=5e-2)

    def test_emission_grad_matches_fd(self):
        scene, orig, dirn, uni, bounces = _setup()
        loss = _loss_fn(scene, orig, dirn, uni, bounces)
        p0 = scene.params()
        g = jax.grad(loss)(p0)

        def f_em(em):
            p = dataclasses.replace(p0, emission=jnp.asarray(em, jnp.float32))
            return float(loss(p))

        fd = _fd(f_em, p0.emission, 2e-3)
        np.testing.assert_allclose(np.asarray(g.emission), fd, atol=3e-2, rtol=5e-2)

    def test_scatter_grad_matches_fd(self):
        scene, orig, dirn, uni, bounces = _setup()
        loss = _loss_fn(scene, orig, dirn, uni, bounces)
        p0 = scene.params()
        g = jax.grad(loss)(p0)

        def f_sc(sc_):
            p = dataclasses.replace(p0, scatter=jnp.asarray(sc_, jnp.float32))
            return float(loss(p))

        fd = _fd(f_sc, p0.scatter, 2e-3)
        np.testing.assert_allclose(np.asarray(g.scatter), fd, atol=5e-2, rtol=8e-2)


class TestGeometryGradients:
    def test_vertex_grad_matches_fd_single_triangle(self):
        # One big triangle in front of the camera: every hit is interior,
        # so no FD step flips visibility -> detached-visibility grads match
        # plain finite differences.
        from atray_tpu.scene.data import TriMesh, _f32, _i32

        tri = TriMesh(
            vertices=_f32([[-2.0, -2.0, -3.0], [2.0, -2.0, -3.0], [0.0, 2.0, -3.0]]),
            faces=_i32([[0, 1, 2]]),
            normals=_f32([[0.0, 0.0, 1.0]]),
            face_normal_idx=_i32([[-1, -1, -1]]),
            tex_coords=_f32([[0.0, 0.0]]),
            face_tex_idx=_i32([[-1, -1, -1]]),
            material_id=_i32([1]),
        )
        scene = build_scene([tri], materials=MATS)
        cam = look_at_camera((0, 0, 1), (0, 0, -3), h_fov=0.3, aspect=1.0)
        orig, dirn = camera_rays(cam, 8, 8, spp=1)
        uni = draw_bounce_uniforms(jax.random.PRNGKey(3), 2, orig.shape[0])
        loss = _loss_fn(scene, orig, dirn, uni, 2)
        p0 = scene.params()
        g = jax.grad(loss)(p0)

        def f_v(v):
            p = dataclasses.replace(p0, vertices=jnp.asarray(v, jnp.float32))
            return float(loss(p))

        fd = _fd(f_v, p0.vertices, 1e-3)
        np.testing.assert_allclose(np.asarray(g.vertices), fd, atol=5e-2, rtol=5e-2)
        assert np.abs(fd).max() > 1e-3  # gradient is actually nonzero

    def test_normal_grad_matches_fd(self):
        scene, orig, dirn, uni, bounces = _setup(bounces=2)
        loss = _loss_fn(scene, orig, dirn, uni, bounces)
        p0 = scene.params()
        g = jax.grad(loss)(p0)
        gn = np.asarray(g.normals)
        # FD over a few normals with the largest analytic gradient
        flat = np.abs(gn).sum(axis=1)
        top = np.argsort(flat)[-3:]
        for vi in top:
            for c in range(3):
                eps = 1e-3
                n = np.asarray(p0.normals, np.float64)
                np_p = n.copy(); np_p[vi, c] += eps
                np_m = n.copy(); np_m[vi, c] -= eps

                def f(nv):
                    p = dataclasses.replace(p0, normals=jnp.asarray(nv, jnp.float32))
                    return float(loss(p))

                fd = (f(np_p) - f(np_m)) / (2 * eps)
                np.testing.assert_allclose(gn[vi, c], fd, atol=5e-2, rtol=8e-2)


class TestOracleGradientParity:
    def test_albedo_fd_matches_numpy_oracle_fd(self):
        # the JAX renderer and the numpy oracle must agree not just on the
        # image but on its sensitivity: FD of both, same uniforms
        scene, orig, dirn, uni, bounces = _setup(w=8, h=8)
        p0 = scene.params()
        eps = 1e-2

        def jax_img(alb):
            sc = scene.with_params(
                dataclasses.replace(p0, albedo=jnp.asarray(alb, jnp.float32))
            )
            return np.asarray(
                trace_radiance(sc, orig, dirn, bounces, uniforms=uni)
            ).astype(np.float64)

        def orc_img(alb):
            sc = scene.with_params(
                dataclasses.replace(p0, albedo=jnp.asarray(alb, jnp.float32))
            )
            scn = oracle.scene_to_numpy(sc)
            return oracle.trace(
                np.asarray(orig), np.asarray(dirn), scn, bounces, np.asarray(uni)
            ).astype(np.float64)

        a = np.asarray(p0.albedo, np.float64)
        ap = a.copy(); ap[1, 0] += eps
        am = a.copy(); am[1, 0] -= eps
        fd_jax = (jax_img(ap) - jax_img(am)) / (2 * eps)
        fd_orc = (orc_img(ap) - orc_img(am)) / (2 * eps)
        np.testing.assert_allclose(fd_jax, fd_orc, atol=1e-4)

    def test_albedo_grad_matches_oracle_fd(self):
        # jax.grad against the ORACLE's central difference. The tolerance
        # here is 1e-2: an f32-oracle FD has truncation + rounding noise
        # far above 1e-4, so this asserts agreement only to FD accuracy.
        # The BASELINE 1e-4 criterion is demonstrated by the SENSITIVITY
        # parity tests (same-eps FD of both renderers: albedo above,
        # vertices/normals below), which cancel the FD error itself.
        scene, orig, dirn, uni, bounces = _setup(w=8, h=8)
        p0 = scene.params()

        def loss_jax(params):
            sc = scene.with_params(params)
            return jnp.sum(trace_radiance(sc, orig, dirn, bounces, uniforms=uni))

        g = jax.grad(loss_jax)(p0)

        def loss_orc(alb):
            sc = scene.with_params(
                dataclasses.replace(p0, albedo=jnp.asarray(alb, jnp.float32))
            )
            scn = oracle.scene_to_numpy(sc)
            return float(
                oracle.trace(
                    np.asarray(orig), np.asarray(dirn), scn, bounces, np.asarray(uni)
                ).sum()
            )

        a = np.asarray(p0.albedo, np.float64)
        for idx in [(1, 0), (1, 2), (2, 1)]:
            eps = 2e-2
            ap = a.copy(); ap[idx] += eps
            am = a.copy(); am[idx] -= eps
            fd = (loss_orc(ap) - loss_orc(am)) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(g.albedo)[idx], fd, atol=1e-2, rtol=1e-2
            )

    def test_vertex_fd_matches_numpy_oracle_fd(self):
        # BASELINE "pixel gradients allclose 1e-4 vs CPU reference" for
        # VERTEX positions: central difference of the rendered image w.r.t.
        # a vertex coordinate, evaluated by BOTH renderers with identical
        # eps and uniforms, must agree to 1e-4 per pixel. Both FDs see the
        # same silhouette behavior (the images agree pointwise), so this
        # isolates renderer-gradient parity from FD truncation error.
        scene, orig, dirn, uni, bounces = _setup(w=8, h=8)
        p0 = scene.params()
        eps = 2e-3

        def jax_img(verts):
            sc = scene.with_params(
                dataclasses.replace(p0, vertices=jnp.asarray(verts, jnp.float32))
            )
            return np.asarray(
                trace_radiance(sc, orig, dirn, bounces, uniforms=uni)
            ).astype(np.float64)

        def orc_img(verts):
            sc = scene.with_params(
                dataclasses.replace(p0, vertices=jnp.asarray(verts, jnp.float32))
            )
            scn = oracle.scene_to_numpy(sc)
            return oracle.trace(
                np.asarray(orig), np.asarray(dirn), scn, bounces, np.asarray(uni)
            ).astype(np.float64)

        # probe the vertices the image actually depends on (largest
        # analytic gradient of the pixel sum)
        g = jax.grad(
            lambda p: jnp.sum(
                trace_radiance(scene.with_params(p), orig, dirn, bounces,
                               uniforms=uni)
            )
        )(p0)
        gv = np.abs(np.asarray(g.vertices)).sum(axis=1)
        top = np.argsort(gv)[-3:]
        v = np.asarray(p0.vertices, np.float64)
        peak = 0.0
        for (vi, c) in [(int(top[0]), 0), (int(top[1]), 1), (int(top[2]), 2)]:
            vp = v.copy(); vp[vi, c] += eps
            vm = v.copy(); vm[vi, c] -= eps
            fd_jax = (jax_img(vp) - jax_img(vm)) / (2 * eps)
            fd_orc = (orc_img(vp) - orc_img(vm)) / (2 * eps)
            np.testing.assert_allclose(fd_jax, fd_orc, atol=1e-4)
            peak = max(peak, float(np.abs(fd_jax).max()))
        # at least one probed vertex must actually influence the image
        assert peak > 1e-3

    def test_normal_fd_matches_numpy_oracle_fd(self):
        # Same sensitivity-parity criterion for VERTEX NORMALS (smooth
        # shading path, reference renderer.cpp:124-149).
        scene, orig, dirn, uni, bounces = _setup(w=8, h=8)
        p0 = scene.params()
        eps = 2e-3

        def jax_img(normals):
            sc = scene.with_params(
                dataclasses.replace(p0, normals=jnp.asarray(normals, jnp.float32))
            )
            return np.asarray(
                trace_radiance(sc, orig, dirn, bounces, uniforms=uni)
            ).astype(np.float64)

        def orc_img(normals):
            sc = scene.with_params(
                dataclasses.replace(p0, normals=jnp.asarray(normals, jnp.float32))
            )
            scn = oracle.scene_to_numpy(sc)
            return oracle.trace(
                np.asarray(orig), np.asarray(dirn), scn, bounces, np.asarray(uni)
            ).astype(np.float64)

        n = np.asarray(p0.normals, np.float64)
        if n.shape[0] == 0:
            import pytest

            pytest.skip("setup scene has no vertex normals")
        for (vi, c) in [(0, 0), (min(3, n.shape[0] - 1), 2)]:
            npp = n.copy(); npp[vi, c] += eps
            nm = n.copy(); nm[vi, c] -= eps
            fd_jax = (jax_img(npp) - jax_img(nm)) / (2 * eps)
            fd_orc = (orc_img(npp) - orc_img(nm)) / (2 * eps)
            np.testing.assert_allclose(fd_jax, fd_orc, atol=1e-4)
