"""Monte-Carlo spherical-harmonic projection of view-dependent functions.

Parity with octree/nerf/sh_proj.py (itself a port of google/spherical-
harmonics): project a per-point directional radiance function onto the SH
basis with uniform sphere sampling, plus the least-squares variant. Our
basis evaluator is the shared ops.sh.sh_basis, so projection and decoding
are bit-consistent; the heavy per-(point, dir) function evaluation is the
caller's cross-broadcast MLP (models.NerfModel.eval_points_cross).
"""

import numpy as np

from plenoctree_tpu.ops.sh import sh_basis


def spherical_uniform_dirs(sample_count, rng=None):
    """[S, 3] uniform directions on the sphere (area-preserving mapping,
    parity: octree/nerf/sh_proj.py:241-245)."""
    rng = rng or np.random.default_rng()
    u1 = rng.random(sample_count)
    u2 = rng.random(sample_count)
    theta = np.arccos(2.0 * u1 - 1.0)
    phi = 2.0 * np.pi * u2
    sin_t = np.sin(theta)
    return np.stack(
        [sin_t * np.cos(phi), sin_t * np.sin(phi), np.cos(theta)], axis=-1
    ).astype(np.float32)


def project_function_nerf(order, spherical_fn, sample_count, rng=None):
    """Monte-Carlo projection of a batched directional function onto SH.

    Args:
      order: max SH degree.
      spherical_fn: dirs [S, 3] -> (values [P, S, C], sigma [P, ...]).
      sample_count: number of Monte-Carlo directions.

    Returns:
      coeffs [P, C, (order+1)^2], sigma (passed through).
    """
    dirs = spherical_uniform_dirs(sample_count, rng)
    values, sigma = spherical_fn(dirs)
    basis = np.asarray(sh_basis(order, dirs))  # [S, K]
    # MC estimate of the sphere integral: 4*pi/S * sum_s f(d_s) Y_k(d_s).
    factor = 4.0 * np.pi / sample_count
    coeffs = np.einsum("psc,sk->pck", np.asarray(values), basis) * factor
    return coeffs.astype(np.float32), sigma


def project_function_nerf_sparse(order, spherical_fn, sample_count, rng=None):
    """Least-squares projection variant (parity: sh_proj.py:308-345):
    solve basis @ coeffs = values instead of MC integration — more accurate
    for small sample counts."""
    dirs = spherical_uniform_dirs(sample_count, rng)
    values, sigma = spherical_fn(dirs)  # [P, S, C]
    basis = np.asarray(sh_basis(order, dirs))  # [S, K]
    v = np.asarray(values)
    p, s, c = v.shape
    sol, *_ = np.linalg.lstsq(basis, v.transpose(1, 0, 2).reshape(s, p * c), rcond=None)
    coeffs = sol.reshape(-1, p, c).transpose(1, 2, 0)  # [P, C, K]
    return coeffs.astype(np.float32), sigma
