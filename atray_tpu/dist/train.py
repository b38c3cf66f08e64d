"""Inverse rendering: sharded pixel-loss gradient steps (BASELINE config 5).

The capability the reference lacks entirely (it has no differentiation):
optimize scene parameters (vertex positions, normals, material
emission/albedo/scatter) from target images by gradient descent. SPMD
layout: rays + target pixels sharded over the mesh axis, parameters
replicated, per-shard gradients all-reduced with an explicit ``psum`` over
ICI — the gradient-reduction design from SURVEY.md §5.8.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from atray_tpu.render.wavefront import trace_radiance
from atray_tpu.scene.data import Scene, SceneParams


def make_loss_and_grad(
    scene_template: Scene,
    bounce_limit: int,
    mesh: Mesh,
    accel=None,
    axis_name: str = "rays",
    refit: bool = False,
) -> Callable:
    """Returns f(params, orig, dirn, target, key) -> (loss, grads).

    orig/dirn/target are flat (N, 3) arrays sharded over ``axis_name``;
    params replicated. Loss = mean squared pixel error over all N rays;
    grads arrive fully psum-reduced (identical on every shard).

    ``refit=True`` (vertex optimization): the accel's leaf records and
    child boxes are recomputed from the CURRENT vertices on-device every
    evaluation (accel.refit_wide), so the traversal never goes stale as
    geometry moves — no host rebuild, no recompile.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _loss_grad(params: SceneParams, orig, dirn, target, key):
        shard = jax.lax.axis_index(axis_name)
        gids = shard * orig.shape[0] + jnp.arange(
            orig.shape[0], dtype=jnp.int32
        )
        n_total = orig.shape[0] * jax.lax.axis_size(axis_name)

        def local_loss(p):
            scene = scene_template.with_params(p)
            accel_ = accel
            if refit and accel is not None:
                from atray_tpu.accel.wide import refit_wide

                accel_ = refit_wide(
                    accel, scene.mesh.vertices, scene.mesh.faces
                )
            color = trace_radiance(
                scene, orig, dirn, bounce_limit, key=key, accel=accel_,
                ray_ids=gids,
            )
            return jnp.sum((color - target) ** 2) / (3.0 * n_total)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axis_name)
        grads = jax.lax.psum(grads, axis_name)
        return loss, grads

    return _loss_grad


def make_train_step(
    scene_template: Scene,
    bounce_limit: int,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    accel=None,
    axis_name: str = "rays",
    refit: bool = False,
) -> Callable:
    """Returns step(params, opt_state, orig, dirn, target, key) ->
    (params, opt_state, loss). Jit-compatible; rays/target sharded,
    params/opt_state replicated, gradient psum inside."""
    loss_grad = make_loss_and_grad(
        scene_template, bounce_limit, mesh, accel=accel, axis_name=axis_name,
        refit=refit,
    )

    def step(params, opt_state, orig, dirn, target, key):
        loss, grads = loss_grad(params, orig, dirn, target, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
