"""Ray sampling: stratified coarse sampling and inverse-CDF importance
resampling.

Behavior parity with nerf_sh/nerf/model_utils.py:
  sample_along_rays      :104-142 (stratified / lindisp)
  piecewise_constant_pdf :225-286 (inverse-CDF with sorted-interval trick)
  sample_pdf             :289-314 (resample + merge-sort with coarse z)
  add_gaussian_noise     :317-332
  cast_rays              :97-101

All functions are static-shape and jit-safe; the interval search in
`piecewise_constant_pdf` is the O(bins * samples) masked-minmax formulation
(no sort, no data-dependent control flow) which XLA maps onto the VPU as two
dense reductions - on TPU this beats a gather-based searchsorted for the
small bin counts used here (<= 191).
"""

import os

import jax.numpy as jnp
from jax import lax, random


def cast_rays(z_vals, origins, directions):
    """Point positions [..., S, 3] from per-ray z values [..., S]."""
    return origins[..., None, :] + z_vals[..., None] * directions[..., None, :]


def sample_along_rays(key, origins, directions, num_samples, near, far, randomized, lindisp):
    """Stratified sampling along rays.

    Returns:
      z_vals: [batch, num_samples]
      points: [batch, num_samples, 3]
    """
    batch_size = origins.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num_samples)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = random.uniform(key, (batch_size, num_samples))
        z_vals = lower + (upper - lower) * t_rand
    else:
        z_vals = jnp.broadcast_to(z_vals[None], (batch_size, num_samples))
    return z_vals, cast_rays(z_vals, origins, directions)


def _inverse_cdf(bins, weights, u):
    """Invert the piecewise-constant CDF over `bins` at positions `u`."""
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    # Pad tiny/zero distributions up to `eps` total mass to avoid NaNs.
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )

    # For each u find the bracketing cdf interval via masked min/max over the
    # (sorted) edge axis: x0 = last edge with cdf <= u, x1 = first edge after.
    mask = u[..., None, :] >= cdf[..., :, None]  # [batch, edges, samples]

    def find_interval(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), axis=-2)
        return x0, x1

    bins_g0, bins_g1 = find_interval(bins)
    cdf_g0, cdf_g1 = find_interval(cdf)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0.0, 1.0)
    samples = bins_g0 + t * (bins_g1 - bins_g0)
    return lax.stop_gradient(samples)


def piecewise_constant_pdf(key, bins, weights, num_samples, randomized):
    """Draw samples from the piecewise-constant distribution over `bins`.

    Args:
      bins: [batch, num_bins + 1] bin edges.
      weights: [batch, num_bins] unnormalized bin masses.
      num_samples: number of samples to draw per batch row.
      randomized: draw uniform randoms vs. a deterministic linspace.

    Returns:
      [batch, num_samples] sampled positions (gradient-stopped).
    """
    if randomized:
        u = random.uniform(key, weights.shape[:-1] + (num_samples,))
    else:
        u = jnp.linspace(0.0, 1.0 - jnp.finfo(jnp.float32).eps, num_samples)
        u = jnp.broadcast_to(u, weights.shape[:-1] + (num_samples,))
    return _inverse_cdf(bins, weights, u)


def _sorted_uniform(key, shape):
    """Sorted U(0,1) order statistics WITHOUT a sort.

    Normalized cumulative sums of i.i.d. exponentials are distributed as
    sorted uniforms; a cumsum replaces the O(n log^2 n) on-device sort.
    (Same distribution as sorting i.i.d. draws, different RNG stream.)
    """
    e = -jnp.log1p(-random.uniform(key, shape[:-1] + (shape[-1] + 1,)))
    s = jnp.cumsum(e, axis=-1)
    return s[..., :-1] / jnp.maximum(s[..., -1:], 1e-12)


def _merge_sorted(a, b):
    """Merge per-row sorted arrays a [.., n] and b [.., m] -> [.., n+m].

    Dense rank arithmetic instead of sorting the concatenation: XLA fuses
    the broadcast-compare-reduce chains on the VPU with no gathers and no
    sort network (ties: all of `a` before equal elements of `b`).
    """
    n, m = a.shape[-1], b.shape[-1]
    pos_a = jnp.arange(n) + jnp.sum(b[..., None, :] < a[..., :, None], axis=-1)
    pos_b = jnp.arange(m) + jnp.sum(a[..., None, :] <= b[..., :, None], axis=-1)
    j = jnp.arange(n + m)
    out = jnp.sum(
        jnp.where(pos_a[..., None, :] == j[:, None], a[..., None, :], 0.0), axis=-1
    ) + jnp.sum(
        jnp.where(pos_b[..., None, :] == j[:, None], b[..., None, :], 0.0), axis=-1
    )
    return out


# Sort-free fine sampling for the TRAINING path (kill switch for A/B runs).
# History: round 2 reverted this after a silent miscompile "at chunk 8192 in
# the full eval program" — round 3 then proved the SAME program miscompiles
# at batch 8192 with plain jnp.sort too (engine.py::_canary), i.e. the bug
# was the backend shape, not this formulation. Eval programs are
# deterministic and canary-protected, and keep reference-exact jnp.sort
# anyway; the randomized train path uses the cumsum + rank-merge (equal in
# distribution, different RNG stream).
_SORTFREE = os.environ.get("PLENOCTREE_SORTFREE", "1") == "1"


def sample_pdf(key, bins, weights, origins, directions, z_vals, num_samples, randomized):
    """Hierarchical resampling: draw fine samples and merge with coarse z_vals.

    Parity: nerf_sh/nerf/model_utils.py:289-314 — i.i.d. uniform draws and a
    sorted union. Deterministic (eval) calls match the reference bitwise via
    jnp.sort; randomized (train) calls draw sorted-uniform order statistics
    (equal in distribution) and build the union with a rank-merge instead of
    an on-device sort.

    Returns:
      z_vals: [batch, num_coarse + num_fine] sorted union.
      points: [batch, num_coarse + num_fine, 3].
    """
    if randomized and _SORTFREE:
        u = _sorted_uniform(key, weights.shape[:-1] + (num_samples,))
        z_samples = _inverse_cdf(bins, weights, u)
        z_vals = _merge_sorted(z_vals, z_samples)
    else:
        z_samples = piecewise_constant_pdf(key, bins, weights, num_samples, randomized)
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    return z_vals, cast_rays(z_vals, origins, directions)


def add_gaussian_noise(key, raw, noise_std, randomized):
    """Additive density-regularizing noise (training only)."""
    if (noise_std is not None) and noise_std > 0 and randomized:
        return raw + random.normal(key, raw.shape, dtype=raw.dtype) * noise_std
    return raw
