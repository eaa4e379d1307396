"""Spherical-gaussian basis with learnable sharpness/lobe directions.

Behavior parity with nerf_sh/nerf/sg.py:35-66 (eval_sg) and :69-96
(euler2mat); output = (1/N) * sum_i coeffs_i * exp(lambda_i * (mu_i . d - 1))
with lambda forced positive through softplus and lobe directions optionally
given in spherical (theta, phi) form.
"""

import jax
import jax.numpy as jnp


def spher2cart(r, theta, phi):
    """Spherical (r, theta, phi) -> Cartesian [..., 3]."""
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [r * sin_t * jnp.cos(phi), r * sin_t * jnp.sin(phi), r * jnp.cos(theta)],
        axis=-1,
    )


def eval_sg(sg_lambda, sg_mu, sg_coeffs, dirs):
    """Evaluate spherical gaussians at unit directions.

    Args:
      sg_lambda: [N] or [..., N] raw lobe sharpness (softplus applied here).
      sg_mu: [N, 2|3] or [..., N, 2|3] lobe directions; 2 = (theta, phi).
      sg_coeffs: [..., C, N] lobe amplitudes per channel.
      dirs: [..., 3] unit directions.

    Returns:
      [..., C] decoded channel values.
    """
    sg_lambda = jax.nn.softplus(sg_lambda)
    if sg_mu.shape[-1] == 2:
        sg_mu = spher2cart(1.0, sg_mu[..., 0], sg_mu[..., 1])
    # Lobe response exp(lambda * (mu . d - 1)) in one fused elementwise chain.
    cosine = jnp.einsum("...ij,...j->...i", sg_mu, dirs, precision="highest")
    basis = jnp.exp(sg_lambda * (cosine - 1.0))
    out = jnp.einsum("...ck,...k->...c", sg_coeffs, basis, precision="highest")
    return out / sg_lambda.shape[-1]


def euler2mat(angle):
    """Euler angles [..., 3] (x, y, z, radians) -> rotation matrices [..., 3, 3]."""
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zero = jnp.zeros_like(z)
    one = jnp.ones_like(z)
    # Column-major stacking (axis=-1 twice) matches the reference layout.
    zmat = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], axis=-1),
            jnp.stack([sz, cz, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-1,
    )
    ymat = jnp.stack(
        [
            jnp.stack([cy, zero, sy], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([-sy, zero, cy], axis=-1),
        ],
        axis=-1,
    )
    xmat = jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, cx, -sx], axis=-1),
            jnp.stack([zero, sx, cx], axis=-1),
        ],
        axis=-1,
    )
    return jnp.einsum("...ij,...jk,...kq->...iq", xmat, ymat, zmat, precision="highest")
