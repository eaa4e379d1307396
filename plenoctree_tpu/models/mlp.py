"""The NeRF trunk MLP (flax.linen).

Behavior parity with nerf_sh/nerf/model_utils.py:30-94: a `net_depth` x
`net_width` trunk with a skip concat every `skip_layer` layers (at i>0 with
i % skip == 0), a sigma head off the trunk, and an optional view-conditioned
branch (bottleneck + condition concat -> `net_depth_condition` layers) before
the RGB head. Layers are explicitly named Dense_0..Dense_N in call order, the
same names flax '@nn.compact' auto-assigns in JaxNeRF, so reference flax
checkpoints load without key translation.

Also provides `cross()`: trunk once per point, condition branch per
(point, dir) pair — the cross-broadcast trick the reference's torch MLP used
for Monte-Carlo SH projection (octree/nerf/model_utils.py:139-144), which
keeps the expensive 8x256 trunk off the projection's D-fold direction axis.

TPU notes: inputs are flattened to [rows, features] so every layer is one
[rows, in] x [in, out] matmul on the MXU; `compute_dtype=bfloat16` runs the
matmuls in bf16 with f32 params/outputs - default f32 for reference parity.
"""

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
    condition: bool = True  # whether the view-conditioned branch exists
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False  # fused Pallas trunk kernel (non-condition path)

    def setup(self):
        dense = lambda width, name: nn.Dense(
            width,
            kernel_init=jax.nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
            name=name,
        )
        i = 0
        trunk = []
        for _ in range(self.net_depth):
            trunk.append(dense(self.net_width, f"Dense_{i}"))
            i += 1
        self.trunk = trunk
        self.sigma_head = dense(self.num_sigma_channels, f"Dense_{i}")
        i += 1
        if self.condition:
            self.bottleneck = dense(self.net_width, f"Dense_{i}")
            i += 1
            cond = []
            for _ in range(self.net_depth_condition):
                cond.append(dense(self.net_width_condition, f"Dense_{i}"))
                i += 1
            self.cond_layers = cond
        self.rgb_head = dense(self.num_rgb_channels, f"Dense_{i}")

    def _trunk_features(self, x):
        """[rows, feat] -> (trunk activations [rows, W])."""
        inputs = x
        for i, layer in enumerate(self.trunk):
            x = self.net_activation(layer(x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        return x

    def _condition_branch(self, bottleneck, condition):
        x = jnp.concatenate([bottleneck, condition], axis=-1)
        for layer in self.cond_layers:
            x = self.net_activation(layer(x))
        return x

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
        x = x.reshape([-1, feature_dim])
        x = x.astype(self.compute_dtype)
        x = self._trunk_features(x)
        raw_sigma = self.sigma_head(x).astype(jnp.float32)
        raw_sigma = raw_sigma.reshape([-1, num_samples, self.num_sigma_channels])

        if condition is not None:
            b = self.bottleneck(x)
            # Every sample on a ray shares its condition vector.
            condition = jnp.tile(
                condition[:, None, :].astype(self.compute_dtype), (1, num_samples, 1)
            ).reshape([-1, condition.shape[-1]])
            x = self._condition_branch(b, condition)
        raw_rgb = self.rgb_head(x).astype(jnp.float32)
        raw_rgb = raw_rgb.reshape([-1, num_samples, self.num_rgb_channels])
        return raw_rgb, raw_sigma

    def fused_enc(self, x, basis=None, posenc=None):
        """Fused Pallas path: trunk + heads in one kernel.

        Args:
          x: [N, d_in] posenc-encoded sample features — or, with `posenc`
            set, the raw [N, 3] sample coordinates. (An earlier in-kernel
            posenc built the encoding with 10 lane-concats of [T, 3] slabs
            and measured slower — Mosaic relayouts; the current form is
            concat-free: four_feat = sin(x @ S + off) plus split first-layer
            weights, so the [N, 63] encoding never exists in HBM.)
          basis: optional [N, K] per-row SH basis values. When given, the
            head's C*K coefficients are contracted against it inside the
            kernel epilogue and raw_rgb comes back already decoded [N, C]
            (the coefficient block never round-trips HBM).
          posenc: optional (min_deg, max_deg) to fuse the positional
            encoding into the kernel (non-legacy layout only).

        Returns:
          raw_rgb [N, num_rgb_channels or C], raw_sigma [N, num_sigma_channels].

        Materializes each layer's params by probing it with one row (shape
        creation identical to the reference path; XLA dead-code-eliminates
        the probe), then packs them with traced jnp ops so the custom VJP's
        weight grads flow back into the flax param tree.
        """
        from plenoctree_tpu.kernels import fused_mlp as fk

        d_probe = (
            3 * (1 + 2 * (posenc[1] - posenc[0])) if posenc else x.shape[-1]
        )
        probe = jnp.zeros((1, d_probe), x.dtype)
        h = probe
        for i, layer in enumerate(self.trunk):
            h = layer(h)
            if i % self.skip_layer == 0 and i > 0:
                h = jnp.concatenate([h, probe], axis=-1)
        self.sigma_head(h)
        self.rgb_head(h)

        kernels, biases = [], []
        for layer in list(self.trunk) + [self.sigma_head, self.rgb_head]:
            p = layer.variables["params"]
            kernels.append(p["kernel"])
            biases.append(p["bias"])
        flat, meta = fk.pack_params_traced(
            kernels, biases, self.skip_layer, posenc=posenc,
            sh_dim=0 if basis is None else basis.shape[-1],
        )
        fused = fk.make_fused_trunk(meta)
        raw_sigma, raw_rgb = fused(tuple(flat), x, basis)
        return raw_rgb, raw_sigma

    def cross(self, x, condition):
        """Cross-broadcast evaluation: every point against every direction.

        Args:
          x: [P, feature] encoded points.
          condition: [D, feature] encoded directions.

        Returns:
          raw_rgb [P, D, num_rgb_channels], raw_sigma [P, num_sigma_channels].
        """
        x = x.astype(self.compute_dtype)
        x = self._trunk_features(x)
        raw_sigma = self.sigma_head(x).astype(jnp.float32)
        b = self.bottleneck(x)
        p, d = b.shape[0], condition.shape[0]
        bb = jnp.broadcast_to(b[:, None, :], (p, d, b.shape[-1])).reshape(p * d, -1)
        cc = jnp.broadcast_to(
            condition[None, :, :].astype(self.compute_dtype),
            (p, d, condition.shape[-1]),
        ).reshape(p * d, -1)
        out = self._condition_branch(bb, cc)
        raw_rgb = self.rgb_head(out).astype(jnp.float32).reshape(p, d, -1)
        return raw_rgb, raw_sigma
