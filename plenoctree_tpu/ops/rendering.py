"""Volumetric alpha compositing.

Behavior parity with nerf_sh/nerf/model_utils.py:176-222 including the exact
constants (eps=1e-10 transmittance guard, 1e10 far-cap distance) and the
white-background blend, so PSNR matches the reference semantics exactly.
The cumulative transmittance uses an exclusive cumprod, which XLA lowers to a
log-depth scan fused with the surrounding elementwise ops.
"""

import jax.numpy as jnp


def volumetric_rendering(rgb, sigma, z_vals, dirs, white_bkgd):
    """Composite per-sample colors/densities into per-ray outputs.

    Args:
      rgb: [batch, num_samples, 3] sample colors (already activated).
      sigma: [batch, num_samples, 1] or [batch, num_samples] sample
        densities (already activated). The 2D form exists for the train
        path: [B*S, 1]-shaped elementwise ops tile as (8, 128) with one
        live lane column (1/128 VPU efficiency — profiled 2.4 ms/step in
        the relu VJP alone at the bench scale), while [B, S] tiles densely.
      z_vals: [batch, num_samples] sample depths along each ray.
      dirs: [batch, 3] (unnormalized) ray directions; their norm converts
        z-distances to metric distances.
      white_bkgd: composite onto a white background.

    Returns:
      comp_rgb: [batch, 3], disp: [batch], acc: [batch],
      weights: [batch, num_samples].
    """
    eps = 1e-10
    dists = jnp.concatenate(
        [
            z_vals[..., 1:] - z_vals[..., :-1],
            jnp.broadcast_to(jnp.asarray([1e10], z_vals.dtype), z_vals[..., :1].shape),
        ],
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    if sigma.ndim == rgb.ndim:
        sigma = sigma[..., 0]
    alpha = 1.0 - jnp.exp(-sigma * dists)
    # Exclusive cumulative transmittance T_i = prod_{j<i} (1 - alpha_j + eps).
    trans = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(1.0 - alpha[..., :-1] + eps, axis=-1),
        ],
        axis=-1,
    )
    weights = alpha * trans

    comp_rgb = jnp.einsum("...s,...sc->...c", weights, rgb)
    depth = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    inv_eps = 1.0 / eps
    disp = acc / depth
    disp = jnp.where((disp > 0) & (disp < inv_eps) & (acc > eps), disp, inv_eps)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, disp, acc, weights
