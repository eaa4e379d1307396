"""Visibility-weight grid rendering for octree masking.

TPU-native equivalent of svox `_C.grid_weight_render`
(octree/extraction.py:181-214, SURVEY.md §2.1): for every training camera,
march rays through the dense sigma grid accumulating compositing weights,
and keep the per-voxel maximum weight over all rays/cameras. Voxels no
training ray ever sees with weight >= threshold get culled from the octree.

Design: fixed-step marching as a lax.fori_loop (steps ~ 2x grid resolution,
nearest-voxel gather per step) vmapped over ray chunks; the per-voxel max is
a scatter-max (`.at[].max`) which XLA lowers to a TPU scatter. All cameras
stream through one jitted function of static (H, W, reso).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plenoctree_tpu.data.rays import generate_rays


@functools.partial(jax.jit, static_argnames=("reso", "n_steps"))
def _march_accumulate(sigma_grid, origins, dirs, offset, invradius, reso, n_steps, weight_acc):
    """March rays, return updated per-voxel max-weight grid [reso^3]."""
    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    o = origins * invradius + offset
    d = viewdirs * invradius
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
    dn = d * delta_scale[..., None]

    safe_dn = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
    t0 = (0.0 - o) / safe_dn
    t1 = (1.0 - o) / safe_dn
    tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0) + 1e-6
    tmax = jnp.min(jnp.maximum(t0, t1), -1) - 1e-6
    span = jnp.maximum(tmax - tmin, 0.0)
    dt = span / n_steps  # per-ray step in tree units

    def body(i, carry):
        weight_acc, light = carry
        t = tmin + (i + 0.5) * dt
        pos = o + t[..., None] * dn
        idx = jnp.clip((pos * reso).astype(jnp.int32), 0, reso - 1)
        flat = (idx[..., 0] * reso + idx[..., 1]) * reso + idx[..., 2]
        sigma = sigma_grid[flat]
        alpha = 1.0 - jnp.exp(-sigma * dt * delta_scale)
        w = light * alpha
        w = jnp.where(span > 0, w, 0.0)
        weight_acc = weight_acc.at[flat].max(w)
        light = light * (1.0 - alpha)
        return weight_acc, light

    light = jnp.ones(origins.shape[0], jnp.float32)
    weight_acc, _ = jax.lax.fori_loop(0, n_steps, body, (weight_acc, light))
    return weight_acc


def calculate_grid_weights(
    dataset, sigmas, reso, invradius, offset, step_factor=2, chunk=65536
):
    """Max per-voxel compositing weight over all training cameras.

    Args:
      dataset: loader exposing w/h/focal/camtoworlds/size.
      sigmas: [reso^3] (or [reso,reso,reso]) density grid (relu'd).
      reso: grid resolution.
      invradius, offset: world->tree transform of the target octree.

    Returns:
      [reso, reso, reso] float32 max weights.
    """
    sigma_grid = jnp.asarray(np.asarray(sigmas, np.float32).reshape(-1))
    weight_acc = jnp.zeros(reso**3, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    invradius = jnp.asarray(invradius, jnp.float32)
    n_steps = int(step_factor * reso)

    for vi in range(dataset.size):
        rays = generate_rays(
            dataset.w, dataset.h, dataset.focal, dataset.camtoworlds[vi : vi + 1]
        )
        origins = rays.origins.reshape(-1, 3)
        dirs = rays.directions.reshape(-1, 3)
        n = origins.shape[0]
        pad = (-n) % chunk
        if pad:
            origins = np.pad(origins, ((0, pad), (0, 0)), mode="edge")
            dirs = np.pad(dirs, ((0, pad), (0, 0)), mode="edge")
        for i in range(0, origins.shape[0], chunk):
            weight_acc = _march_accumulate(
                sigma_grid,
                jnp.asarray(origins[i : i + chunk]),
                jnp.asarray(dirs[i : i + chunk]),
                offset,
                invradius,
                reso,
                n_steps,
                weight_acc,
            )
    return np.asarray(weight_acc).reshape(reso, reso, reso)
