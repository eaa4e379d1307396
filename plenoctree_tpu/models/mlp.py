"""The NeRF trunk MLP (flax.linen).

Behavior parity with nerf_sh/nerf/model_utils.py:30-94: a `net_depth` x
`net_width` trunk with a skip concat every `skip_layer` layers (at i>0 with
i % skip == 0), a sigma head off the trunk, and an optional view-conditioned
branch (bottleneck + condition concat -> `net_depth_condition` layers) before
the RGB head. Layer auto-naming (Dense_0..Dense_N in call order) matches the
flax '@nn.compact' convention of JaxNeRF so reference flax checkpoints load
into this module without key translation.

TPU notes: inputs are flattened to [rows, features] so every layer is one
[rows, in] x [in, out] matmul on the MXU; `compute_dtype=bfloat16` runs the
matmuls in bf16 with f32 params/outputs (mixed precision) - the default is
f32 for strict reference parity.
"""

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class TrunkMLP(nn.Module):
    """Trunk + sigma head + (optional) view-conditioned color branch."""

    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    net_activation: Callable[..., Any] = nn.relu
    skip_layer: int = 4
    num_rgb_channels: int = 3
    num_sigma_channels: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, condition=None):
        """Run the MLP.

        Args:
          x: [batch, num_samples, feature] encoded points.
          condition: optional [batch, feature] encoded view directions, shared
            by all samples of a ray.

        Returns:
          raw_rgb: [batch, num_samples, num_rgb_channels]
          raw_sigma: [batch, num_samples, num_sigma_channels]
        """
        feature_dim = x.shape[-1]
        num_samples = x.shape[1]
        x = x.reshape([-1, feature_dim]).astype(self.compute_dtype)
        dense = functools.partial(
            nn.Dense,
            kernel_init=jax.nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
        )
        inputs = x
        for i in range(self.net_depth):
            x = self.net_activation(dense(self.net_width)(x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_sigma = dense(self.num_sigma_channels)(x).astype(jnp.float32)
        raw_sigma = raw_sigma.reshape([-1, num_samples, self.num_sigma_channels])

        if condition is not None:
            bottleneck = dense(self.net_width)(x)
            # Every sample on a ray shares its condition vector.
            condition = jnp.tile(
                condition[:, None, :].astype(self.compute_dtype), (1, num_samples, 1)
            ).reshape([-1, condition.shape[-1]])
            x = jnp.concatenate([bottleneck, condition], axis=-1)
            for _ in range(self.net_depth_condition):
                x = self.net_activation(dense(self.net_width_condition)(x))
        raw_rgb = dense(self.num_rgb_channels)(x).astype(jnp.float32)
        raw_rgb = raw_rgb.reshape([-1, num_samples, self.num_rgb_channels])
        return raw_rgb, raw_sigma
