"""Coarse+fine NeRF with SH / SG / view-conditioned color heads.

Behavior parity with nerf_sh/nerf/models.py (NerfModel :52-348,
construct_nerf :351-428): stratified coarse pass -> posenc -> MLP_0 ->
color-head decode -> compositing -> inverse-CDF fine resampling -> MLP_1 ->
compositing. Submodule names MLP_0/MLP_1 and the SG variables
(sg_lambda/sg_mu_spher) keep reference checkpoint layouts loadable.

The color heads:
  sh_deg >= 0 : MLP emits 3*(sh_deg+1)^2 SH coefficients, decoded against the
                ray's view direction with ops.sh.eval_sh (MXU contraction).
  sg_dim > 0  : MLP emits 3*sg_dim SG amplitudes; lambda/mu are global
                learnable variables.
  use_viewdirs: classic NeRF conditioning (mutually exclusive with SH/SG).
"""

import os
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn
from jax import random

from plenoctree_tpu.ops import posenc, eval_sh, eval_sg
from plenoctree_tpu.ops import sampling as ops_sampling
from plenoctree_tpu.ops.rendering import volumetric_rendering
from plenoctree_tpu.ops.sh import sh_basis
from plenoctree_tpu.models.mlp import TrunkMLP


class NerfModel(nn.Module):
    """NeRF with both coarse and fine MLPs."""

    num_coarse_samples: int
    num_fine_samples: int
    use_viewdirs: bool
    sh_deg: int
    sg_dim: int
    near: float
    far: float
    noise_std: float
    net_depth: int
    net_width: int
    net_depth_condition: int
    net_width_condition: int
    net_activation: Callable[..., Any]
    skip_layer: int
    num_rgb_channels: int
    num_sigma_channels: int
    white_bkgd: bool
    min_deg_point: int
    max_deg_point: int
    deg_view: int
    lindisp: bool
    rgb_activation: Callable[..., Any]
    sigma_activation: Callable[..., Any]
    legacy_posenc_order: bool
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False

    def setup(self):
        mlp_kwargs = dict(
            net_depth=self.net_depth,
            net_width=self.net_width,
            net_depth_condition=self.net_depth_condition,
            net_width_condition=self.net_width_condition,
            net_activation=self.net_activation,
            skip_layer=self.skip_layer,
            num_rgb_channels=self.num_rgb_channels,
            num_sigma_channels=self.num_sigma_channels,
            # Only materialize the view branch when conditioning is used, so
            # layer numbering (sigma head -> rgb head) matches the reference's
            # call-order auto-naming for SH/SG models.
            condition=self.use_viewdirs,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
        )
        self.MLP_0 = TrunkMLP(**mlp_kwargs)
        self.MLP_1 = TrunkMLP(**mlp_kwargs)

        if self.sg_dim > 0:
            key1, key2 = random.split(random.PRNGKey(0), 2)
            self.sg_lambda = self.variable(
                "params", "sg_lambda", lambda n: jnp.ones([n], jnp.float32), self.sg_dim
            )
            self.sg_mu_spher = self.variable(
                "params",
                "sg_mu_spher",
                lambda n: jnp.concatenate(
                    [
                        random.uniform(key1, [n, 1]) * jnp.pi,
                        random.uniform(key2, [n, 1]) * 2.0 * jnp.pi,
                    ],
                    axis=-1,
                ),
                self.sg_dim,
            )

    def _quick_init(self):
        """Touch every submodule once with token shapes (for `init`)."""
        points_enc = posenc(
            jnp.zeros((1, 1, 3), jnp.float32),
            self.min_deg_point,
            self.max_deg_point,
            self.legacy_posenc_order,
        )
        if self.use_viewdirs:
            viewdirs_enc = posenc(
                jnp.zeros((1, 1, 3), jnp.float32), 0, self.deg_view, self.legacy_posenc_order
            )
            self.MLP_0(points_enc, viewdirs_enc)
            if self.num_fine_samples > 0:
                self.MLP_1(points_enc, viewdirs_enc)
        else:
            self.MLP_0(points_enc)
            if self.num_fine_samples > 0:
                self.MLP_1(points_enc)

    def _use_fused(self):
        return (
            self.use_pallas
            and not self.use_viewdirs
            and not self.legacy_posenc_order
            and not self.is_initializing()
        )

    def _query_mlp(self, mlp, samples, viewdirs_enc=None, basis=None):
        """posenc + trunk on [B, S, 3] samples; fused Pallas kernel when on.

        basis (fused path only): per-ray SH basis [B, K]; the kernel decodes
        the color head in its epilogue and raw_rgb comes back as [B, S, C]
        already contracted (callers then skip _decode_color).
        """
        b, s = samples.shape[0], samples.shape[1]
        if self._use_fused() and viewdirs_enc is None:
            basis_rows = None
            if basis is not None:
                k = basis.shape[-1]
                basis_rows = jnp.broadcast_to(
                    basis[:, None, :], (b, s, k)
                ).reshape(-1, k)
            # In-kernel positional encoding (opt-in, PN_POSENC_IN_KERNEL=1):
            # the XLA posenc chain materializes [N, 30/60/63] intermediates
            # in lane-hostile layouts (~6.5 ms/step on the fine network at
            # batch 4096); the kernel computes sin(x @ S + off) in-tile so
            # the encoding never exists in HBM. Off by default until the
            # chip A/B shows it beating the XLA path (the einsum path
            # measures 84.9k rays/s, round 5).
            pe = None
            if (
                self.min_deg_point < self.max_deg_point
                and os.environ.get("PN_POSENC_IN_KERNEL", "0") == "1"
            ):
                pe = (self.min_deg_point, self.max_deg_point)
                mlp_in = samples.reshape(-1, samples.shape[-1])
            else:
                samples_enc = posenc(
                    samples, self.min_deg_point, self.max_deg_point,
                    self.legacy_posenc_order,
                )
                mlp_in = samples_enc.reshape(-1, samples_enc.shape[-1])
            raw_rgb, raw_sigma = mlp.fused_enc(mlp_in, basis=basis_rows, posenc=pe)
            return raw_rgb.reshape(b, s, -1), raw_sigma.reshape(b, s, -1)
        samples_enc = posenc(
            samples, self.min_deg_point, self.max_deg_point, self.legacy_posenc_order
        )
        if viewdirs_enc is not None:
            return mlp(samples_enc, viewdirs_enc)
        return mlp(samples_enc)

    def _decode_color(self, raw_rgb, viewdirs):
        """Apply the SH/SG color head against per-ray view directions."""
        if self.sh_deg >= 0:
            k = (self.sh_deg + 1) ** 2
            if (
                self.compute_dtype == jnp.bfloat16
                and raw_rgb.ndim == 3
                and viewdirs.ndim == 3
                and viewdirs.shape[1] == 1
            ):
                # Train-path decode, kept FLAT: the einsum form reshapes the
                # coefficients to [B, S, C, K], and XLA materializes that 4D
                # tensor through a layout transpose (profiled 4.1 ms/step of
                # pure relayout at the bench scale, plus broadcast copies of
                # the basis). Instead decode on the native [B, S, C*K] layout:
                # one broadcast multiply against the channel-tiled basis and
                # a [C*K, C] block-indicator matmul for the per-channel sums
                # (the same contraction the fused kernel's epilogue uses,
                # kernels/fused_mlp.py::_channel_selector). Numerics match
                # the einsum's "default" precision class (bf16 MXU operands).
                nc = raw_rgb.shape[-1] // k
                basis = sh_basis(self.sh_deg, viewdirs[:, 0, :])  # [B, K]
                tiled = jnp.concatenate([basis] * nc, axis=-1)  # [B, C*K]
                prod = raw_rgb * tiled[:, None, :]
                j = jnp.arange(nc * k) // k
                sel = (j[:, None] == jnp.arange(nc)[None, :]).astype(
                    raw_rgb.dtype
                )
                return jnp.dot(prod, sel)  # [B, S, C]
            precision = (
                "default" if self.compute_dtype == jnp.bfloat16 else "highest"
            )
            raw_rgb = eval_sh(
                self.sh_deg,
                raw_rgb.reshape(raw_rgb.shape[:-1] + (-1, k)),
                viewdirs,
                precision=precision,
            )
        elif self.sg_dim > 0:
            sg_coeffs = raw_rgb.reshape(raw_rgb.shape[:-1] + (-1, self.sg_dim))
            raw_rgb = eval_sg(
                self.sg_lambda.value, self.sg_mu_spher.value, sg_coeffs, viewdirs
            )
        return raw_rgb

    def eval_points_raw(self, points, viewdirs=None, coarse=False):
        """Raw MLP outputs at arbitrary points (for octree extraction).

        Args:
          points: [B, 3].
          viewdirs: [B, 3] (required when use_viewdirs).
          coarse: query the coarse MLP instead of fine.

        Returns:
          raw_rgb [B, C*basis], raw_sigma [B, num_sigma_channels].
        """
        mlp = self.MLP_0 if (coarse or self.num_fine_samples <= 0) else self.MLP_1
        if self.use_viewdirs:
            assert viewdirs is not None
            points_enc = posenc(
                points[None],
                self.min_deg_point,
                self.max_deg_point,
                self.legacy_posenc_order,
            )
            viewdirs_enc = posenc(
                viewdirs[None], 0, self.deg_view, self.legacy_posenc_order
            )
            raw_rgb, raw_sigma = mlp(points_enc, viewdirs_enc)
            return raw_rgb[0], raw_sigma[0]
        raw_rgb, raw_sigma = self._query_mlp(mlp, points[None])
        return raw_rgb[0], raw_sigma[0]

    def eval_points_cross(self, points, viewdirs, coarse=False):
        """Cross-broadcast raw outputs: every point against every direction.

        Used by Monte-Carlo SH projection of view-dependent NeRFs (parity:
        octree/nerf/models.py:211-252 with cross_broadcast=True). Requires
        use_viewdirs. The trunk runs once per point; only the small condition
        branch runs per (point, dir) pair.

        Args:
          points: [P, 3]; viewdirs: [D, 3].

        Returns:
          raw_rgb [P, D, 3], raw_sigma [P, num_sigma_channels].
        """
        assert self.use_viewdirs
        points_enc = posenc(
            points, self.min_deg_point, self.max_deg_point, self.legacy_posenc_order
        )
        viewdirs_enc = posenc(viewdirs, 0, self.deg_view, self.legacy_posenc_order)
        mlp = self.MLP_0 if (coarse or self.num_fine_samples <= 0) else self.MLP_1
        return mlp.cross(points_enc, viewdirs_enc)

    def eval_points(self, points, viewdirs=None, coarse=False):
        """Activated (rgb, sigma) at arbitrary points, decoding SH/SG."""
        raw_rgb, raw_sigma = self.eval_points_raw(points, viewdirs, coarse)
        if self.sh_deg >= 0 or self.sg_dim > 0:
            assert viewdirs is not None
            raw_rgb = self._decode_color(raw_rgb[:, None, :], viewdirs[:, None])[:, 0]
        return self.rgb_activation(raw_rgb), self.sigma_activation(raw_sigma)

    def __call__(self, rng_0, rng_1, rays, randomized):
        """Render a batch of rays.

        Args:
          rng_0 / rng_1: PRNG keys for coarse / fine sampling.
          rays: Rays namedtuple of [B, 3] origins/directions/viewdirs.
          randomized: use randomized stratified sampling + noise.

        Returns:
          [(rgb_coarse, disp_c, acc_c)] (+ [(rgb_fine, disp, acc)] if fine).
        """
        key, rng_0 = random.split(rng_0)
        z_vals, samples = ops_sampling.sample_along_rays(
            key,
            rays.origins,
            rays.directions,
            self.num_coarse_samples,
            self.near,
            self.far,
            randomized,
            self.lindisp,
        )
        if self.use_viewdirs:
            viewdirs_enc = posenc(
                rays.viewdirs, 0, self.deg_view, self.legacy_posenc_order
            )
        else:
            viewdirs_enc = None
        # In-kernel SH decode (fused path): the basis is per-ray, so compute
        # it once here and let the trunk kernel contract the coefficient
        # block in its epilogue — [B*S, C*K] never touches HBM.
        decode_fused = (
            self._use_fused()
            and viewdirs_enc is None
            and self.sh_deg >= 0
            # In-kernel SH decode is opt-in (PN_SH_IN_KERNEL=1): measured on
            # chip (round 5), the XLA einsum decode trains at 84.4k rays/s
            # vs 76.7k with the original in-kernel epilogue — the decode's
            # HBM saving did not cover its VPU cost at these shapes.
            and os.environ.get("PN_SH_IN_KERNEL", "0") == "1"
        )
        basis = sh_basis(self.sh_deg, rays.viewdirs) if decode_fused else None
        raw_rgb, raw_sigma = self._query_mlp(
            self.MLP_0, samples, viewdirs_enc, basis=basis
        )
        if raw_sigma.shape[-1] == 1:
            # Keep sigma [B, S] through noise/activation/compositing: the
            # [B, S, 1] form flattens to [B*S, 1]{8,128} on TPU — one live
            # lane column (see ops/rendering.py::volumetric_rendering).
            raw_sigma = raw_sigma[..., 0]

        key, rng_0 = random.split(rng_0)
        raw_sigma = ops_sampling.add_gaussian_noise(
            key, raw_sigma, self.noise_std, randomized
        )
        if not decode_fused:
            raw_rgb = self._decode_color(raw_rgb, rays.viewdirs[:, None])
        rgb = self.rgb_activation(raw_rgb)
        sigma = self.sigma_activation(raw_sigma)
        comp_rgb, disp, acc, weights = volumetric_rendering(
            rgb, sigma, z_vals, rays.directions, white_bkgd=self.white_bkgd
        )
        ret = [(comp_rgb, disp, acc)]

        if self.num_fine_samples > 0:
            z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            key, rng_1 = random.split(rng_1)
            z_vals, samples = ops_sampling.sample_pdf(
                key,
                z_vals_mid,
                weights[..., 1:-1],
                rays.origins,
                rays.directions,
                z_vals,
                self.num_fine_samples,
                randomized,
            )
            raw_rgb, raw_sigma = self._query_mlp(
                self.MLP_1, samples, viewdirs_enc, basis=basis
            )
            if raw_sigma.shape[-1] == 1:
                raw_sigma = raw_sigma[..., 0]
            key, rng_1 = random.split(rng_1)
            raw_sigma = ops_sampling.add_gaussian_noise(
                key, raw_sigma, self.noise_std, randomized
            )
            if not decode_fused:
                raw_rgb = self._decode_color(raw_rgb, rays.viewdirs[:, None])
            rgb = self.rgb_activation(raw_rgb)
            sigma = self.sigma_activation(raw_sigma)
            comp_rgb, disp, acc, _ = volumetric_rendering(
                rgb, sigma, z_vals, rays.directions, white_bkgd=self.white_bkgd
            )
            ret.append((comp_rgb, disp, acc))
        return ret


def _activation_by_name(name):
    fn = getattr(nn, str(name))
    return fn


def construct_nerf(key, args):
    """Build a NerfModel + init variables from a config namespace.

    Validates output activation ranges and expands the color channel count
    for SH/SG heads (parity: nerf_sh/nerf/models.py:351-428).
    """
    net_activation = _activation_by_name(args.net_activation)
    rgb_activation = _activation_by_name(args.rgb_activation)
    sigma_activation = _activation_by_name(args.sigma_activation)

    # Probe the activations over a huge dynamic range.
    x = jnp.exp(jnp.linspace(-90, 90, 1024))
    x = jnp.concatenate([-x[::-1], x], 0)
    rgb = rgb_activation(x)
    if jnp.any(rgb < 0) or jnp.any(rgb > 1):
        raise NotImplementedError(
            f"rgb_activation `{args.rgb_activation}` produces colors outside [0, 1]"
        )
    sigma = sigma_activation(x)
    if jnp.any(sigma < 0):
        raise NotImplementedError(
            f"sigma_activation `{args.sigma_activation}` produces negative densities"
        )

    num_rgb_channels = args.num_rgb_channels
    if args.sh_deg >= 0:
        assert not args.use_viewdirs and args.sg_dim == -1, (
            "You can only use up to one of: SH, SG or use_viewdirs."
        )
        num_rgb_channels *= (args.sh_deg + 1) ** 2
    elif args.sg_dim > 0:
        assert not args.use_viewdirs and args.sh_deg == -1, (
            "You can only use up to one of: SH, SG or use_viewdirs."
        )
        num_rgb_channels *= args.sg_dim

    model = NerfModel(
        min_deg_point=args.min_deg_point,
        max_deg_point=args.max_deg_point,
        deg_view=args.deg_view,
        num_coarse_samples=args.num_coarse_samples,
        num_fine_samples=args.num_fine_samples,
        use_viewdirs=args.use_viewdirs,
        sh_deg=args.sh_deg,
        sg_dim=args.sg_dim,
        near=args.near,
        far=args.far,
        noise_std=args.noise_std,
        white_bkgd=args.white_bkgd,
        net_depth=args.net_depth,
        net_width=args.net_width,
        net_depth_condition=args.net_depth_condition,
        net_width_condition=args.net_width_condition,
        skip_layer=args.skip_layer,
        num_rgb_channels=num_rgb_channels,
        num_sigma_channels=args.num_sigma_channels,
        lindisp=args.lindisp,
        net_activation=net_activation,
        rgb_activation=rgb_activation,
        sigma_activation=sigma_activation,
        legacy_posenc_order=args.legacy_posenc_order,
        compute_dtype=jnp.bfloat16
        if str(getattr(args, "compute_dtype", "float32")) == "bfloat16"
        else jnp.float32,
        use_pallas=bool(getattr(args, "use_pallas", False)),
    )
    key1, _ = random.split(key)
    init_variables = model.init(key1, method=model._quick_init)
    return model, init_variables


def get_model(key, args):
    model_dict = {"nerf": construct_nerf}
    return model_dict[args.model](key, args)


def get_model_state(key, args, restore=True):
    """Build model + TrainState, optionally restoring the latest checkpoint.

    Parity: nerf_sh/nerf/models.py:38-49, with optax replacing flax.optim.
    """
    from plenoctree_tpu.utils import checkpoints as ckpt_utils

    model, variables = get_model(key, args)
    state = ckpt_utils.create_train_state(variables, args.lr_init)
    if restore:
        state = ckpt_utils.restore_checkpoint(args.train_dir, state)
    return model, state
