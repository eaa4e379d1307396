"""Sinusoidal positional encoding.

Behavior parity with the reference encoder (nerf_sh/nerf/model_utils.py:145-173):
the input is concatenated in front of sin features at scales 2^[min_deg,
max_deg), with cos expressed as a phase-shifted sin so a single fused
transcendental op covers both (VPU-friendly: one `sin` over a wide lane-major
tensor, which XLA fuses with the consuming matmul's operand load).
"""

import jax.numpy as jnp


def posenc(x, min_deg, max_deg, legacy_posenc_order=False):
    """Positionally encode `x` with frequencies 2^[min_deg, max_deg).

    Args:
      x: [..., D] coordinates (nominally in [-pi, pi]).
      min_deg: inclusive minimum frequency degree.
      max_deg: exclusive maximum frequency degree.
      legacy_posenc_order: interleave (sin, cos) per-frequency in the layout of
        the original TF NeRF codebase instead of blocked [sin..., cos...].

    Returns:
      [..., D + 2*D*(max_deg-min_deg)] encoded features, input first.
    """
    if min_deg == max_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    # [..., F, D] scaled copies of the input.
    xb = x[..., None, :] * scales[:, None]
    half_pi = jnp.asarray(0.5 * jnp.pi, dtype=x.dtype)
    if legacy_posenc_order:
        # [..., F, 2, D] -> flatten: per-frequency (sin, cos) blocks.
        four_feat = jnp.sin(jnp.stack([xb, xb + half_pi], axis=-2))
        four_feat = four_feat.reshape(x.shape[:-1] + (-1,))
    else:
        flat = xb.reshape(x.shape[:-1] + (-1,))  # [..., F*D]
        four_feat = jnp.sin(jnp.concatenate([flat, flat + half_pi], axis=-1))
    return jnp.concatenate([x, four_feat], axis=-1)
