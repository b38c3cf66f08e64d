"""SPMD execution over a device mesh: tile/ray sharding + collectives.

TPU-native replacement for the reference's entire parallelism story
(SURVEY.md §2 #25): where the reference spawns 8 OS threads that claim image
tiles off an atomic work queue (renderer.cpp:403-455, work_queue.h), we
shard the flat ray axis over a 1-D device mesh with ``shard_map``. Load
balance needs no dynamic queue: every shard traces the same number of rays
through the same ``lax.while_loop`` traversal, and intra-shard variance
(sky rays vs dragon rays) is absorbed by masking, which is the SPMD analog
of the reference's many-tiles-per-thread heuristic.

Collectives ride ICI: film assembly is the out-sharding (an implicit
all_gather only if the host asks for the full film), and gradient reduction
in dist/train.py is an explicit ``psum`` over the mesh axis.

PRNG discipline (SURVEY.md §7 hard part #5): every shard folds
``axis_index`` into the key, so results are deterministic for a fixed mesh
shape — never per-thread wall-clock seeding like the reference's
``rdtsc * tid`` (pl_utils_win32.cpp:10-15).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from atray_tpu.config import RenderSettings
from atray_tpu.core.camera import Camera, camera_rays
from atray_tpu.render.wavefront import trace_radiance


def make_device_mesh(
    num_devices: int = 0, axis_name: str = "rays", devices=None
) -> Mesh:
    """1-D mesh over the ray/tile axis (SURVEY.md §5.7)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def trace_sharded(
    scene,
    orig: jnp.ndarray,
    dirn: jnp.ndarray,
    bounce_limit: int,
    key: jax.Array,
    mesh: Mesh,
    accel=None,
    axis_name: str = "rays",
) -> jnp.ndarray:
    """Path-trace with rays sharded over the mesh; scene/BVH replicated.

    The number of rays must divide the mesh size (callers pad; the renderer
    below guarantees it). Each shard uses ``fold_in(key, axis_index)`` so
    sample streams are independent across shards yet reproducible.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    def _run(scene_, o, d, k):
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        return trace_radiance(
            scene_, o, d, bounce_limit, key=k, accel=accel
        )

    return _run(scene, orig, dirn, key)


def render_sharded(
    scene,
    camera: Camera,
    settings: RenderSettings,
    key: jax.Array,
    mesh: Mesh,
    accel=None,
    axis_name: str = "rays",
) -> jnp.ndarray:
    """Full sharded forward render -> film (H, W, 3) on the host layout.

    Ray count spp*H*W is padded up to a multiple of the mesh size; pad rays
    trace harmlessly (dir = +z from origin against the real scene, their
    radiance is dropped before the film average).
    """
    w, h = settings.resolution
    spp = settings.samples_per_pixel
    n = spp * h * w
    aa_key, bounce_key = jax.random.split(key)
    orig, dirn = camera_rays(
        camera, w, h, spp,
        key=aa_key if settings.anti_aliasing else None,
        anti_aliasing=settings.anti_aliasing,
    )
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
        dirn = jnp.concatenate(
            [dirn, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dirn.dtype), (pad, 1))]
        )
    color = trace_sharded(
        scene, orig, dirn, settings.bounce_limit, bounce_key, mesh,
        accel=accel, axis_name=axis_name,
    )
    color = color[:n]
    film = color.reshape(spp, h, w, 3).mean(axis=0)
    return jnp.clip(film, 0.0, 1.0)
