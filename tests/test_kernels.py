"""Pallas fused trunk kernel vs the flax reference path (interpret mode on
the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from plenoctree_tpu.kernels.fused_mlp import (
    make_fused_trunk,
    pack_params,
    pack_params_traced,
)
from plenoctree_tpu.models.mlp import TrunkMLP


@pytest.fixture(scope="module")
def small_mlp():
    # Small depth but still exercising the skip concat (depth 5, skip 2).
    mlp = TrunkMLP(
        net_depth=5,
        net_width=32,
        skip_layer=2,
        num_rgb_channels=12,
        condition=False,
        compute_dtype=jnp.bfloat16,
    )
    x3 = jnp.zeros((4, 2, 21))
    variables = mlp.init(random.PRNGKey(0), x3)
    return mlp, variables


class TestFusedTrunk:
    def test_forward_matches_flax(self, small_mlp):
        mlp, variables = small_mlp
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.normal(size=(100, 21)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2)
        fused = make_fused_trunk(meta)
        out_sigma, out_rgb = fused(flat, xs)
        out = jnp.concatenate([out_sigma, out_rgb], -1)
        rgb, sigma = mlp.apply(variables, xs[:, None, :])
        ref = jnp.concatenate([sigma.reshape(-1, 1), rgb.reshape(-1, 12)], -1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def test_grads_match_flax(self, small_mlp):
        mlp, variables = small_mlp
        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.normal(size=(64, 21)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(64, 13)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2)
        fused = make_fused_trunk(meta)

        def loss_fused(fw):
            sg, rgb = fused(fw, xs)
            return jnp.vdot(jnp.concatenate([sg, rgb], -1), gt)

        gf = jax.grad(loss_fused)(tuple(flat))

        def loss_flax(params):
            rgb, sg = mlp.apply({"params": params}, xs[:, None, :])
            out = jnp.concatenate([sg.reshape(-1, 1), rgb.reshape(-1, 12)], -1)
            return jnp.vdot(out, gt)

        gx = jax.grad(loss_flax)(variables["params"])
        names = sorted(gx.keys(), key=lambda k: int(k.split("_")[1]))
        depth = len(names) - 2
        for i in range(depth):
            k = np.asarray(gx[names[i]]["kernel"])
            kf = np.asarray(gf[2 * i])[: k.shape[0]]
            scale = np.abs(k).max() + 1e-9
            assert np.abs(kf - k).max() / scale < 0.05, f"layer {i} kernel"
            b = np.asarray(gx[names[i]]["bias"])
            bf = np.asarray(gf[2 * i + 1])[0]
            assert np.abs(bf - b).max() / (np.abs(b).max() + 1e-9) < 0.05, f"layer {i} bias"
        hk = np.concatenate(
            [np.asarray(gx[names[depth]]["kernel"]), np.asarray(gx[names[depth + 1]]["kernel"])],
            axis=1,
        )
        hkf = np.asarray(gf[2 * depth])[: hk.shape[0], : hk.shape[1]]
        assert np.abs(hkf - hk).max() / (np.abs(hk).max() + 1e-9) < 0.05

    def test_model_level_dispatch(self):
        # NerfModel with use_pallas=True must agree with use_pallas=False.
        from plenoctree_tpu.models import construct_nerf
        from plenoctree_tpu.utils.config import default_config

        base = dict(
            net_depth=3,
            net_width=16,
            num_coarse_samples=4,
            num_fine_samples=4,
            sh_deg=1,
            use_viewdirs=False,
            max_deg_point=4,
            compute_dtype="bfloat16",
        )
        cfg0 = default_config(**base)
        cfg1 = default_config(use_pallas=True, **base)
        model0, variables = construct_nerf(random.PRNGKey(0), cfg0)
        model1, _ = construct_nerf(random.PRNGKey(0), cfg1)
        pts = jnp.asarray(
            np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
        )
        r0, s0 = model0.apply(variables, pts, method=model0.eval_points_raw)
        r1, s1 = model1.apply(variables, pts, method=model1.eval_points_raw)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-2, rtol=2e-2)

    def test_decode_forward_matches_flax(self, small_mlp):
        # sh_dim=4 (deg 1), 12 rgb channels = 3 colors x 4 coeffs: the
        # in-epilogue contraction must equal flax-forward + explicit decode.
        mlp, variables = small_mlp
        rng = np.random.default_rng(2)
        xs = jnp.asarray(rng.normal(size=(100, 21)).astype(np.float32))
        basis = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2)
        meta = dict(meta, sh_dim=4)
        fused = make_fused_trunk(meta)
        out_sigma, out_rgb = fused(flat, xs, basis)
        assert out_rgb.shape == (100, 3)
        rgb, sigma = mlp.apply(variables, xs[:, None, :])
        coeffs = rgb.reshape(-1, 3, 4)
        ref_rgb = jnp.einsum("nck,nk->nc", coeffs, basis)
        np.testing.assert_allclose(
            np.asarray(out_rgb), np.asarray(ref_rgb), atol=5e-2, rtol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(out_sigma), np.asarray(sigma.reshape(-1, 1)),
            atol=2e-2, rtol=2e-2,
        )

    def test_decode_grads_match_flax(self, small_mlp):
        mlp, variables = small_mlp
        rng = np.random.default_rng(3)
        xs = jnp.asarray(rng.normal(size=(64, 21)).astype(np.float32))
        basis = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2)
        meta = dict(meta, sh_dim=4)
        fused = make_fused_trunk(meta)

        def loss_fused(fw):
            sg, rgb3 = fused(fw, xs, basis)
            return jnp.vdot(jnp.concatenate([sg, rgb3], -1), gt)

        gf = jax.grad(loss_fused)(tuple(flat))

        def loss_flax(params):
            rgb, sg = mlp.apply({"params": params}, xs[:, None, :])
            rgb3 = jnp.einsum("nck,nk->nc", rgb.reshape(-1, 3, 4), basis)
            return jnp.vdot(jnp.concatenate([sg.reshape(-1, 1), rgb3], -1), gt)

        gx = jax.grad(loss_flax)(variables["params"])
        names = sorted(gx.keys(), key=lambda k: int(k.split("_")[1]))
        depth = len(names) - 2
        for i in range(depth):
            k = np.asarray(gx[names[i]]["kernel"])
            kf = np.asarray(gf[2 * i])[: k.shape[0]]
            scale = np.abs(k).max() + 1e-9
            assert np.abs(kf - k).max() / scale < 0.05, f"layer {i} kernel"
        hk = np.concatenate(
            [
                np.asarray(gx[names[depth]]["kernel"]),
                np.asarray(gx[names[depth + 1]]["kernel"]),
            ],
            axis=1,
        )
        hkf = np.asarray(gf[2 * depth])[: hk.shape[0], : hk.shape[1]]
        assert np.abs(hkf - hk).max() / (np.abs(hk).max() + 1e-9) < 0.05

    def test_model_full_call_fused_decode(self):
        # Full NerfModel render: the fused path (in-kernel SH decode) must
        # agree with the flax path end-to-end, gradients included.
        from plenoctree_tpu.models import construct_nerf
        from plenoctree_tpu.types import Rays
        from plenoctree_tpu.utils.config import default_config

        base = dict(
            net_depth=3,
            net_width=16,
            num_coarse_samples=4,
            num_fine_samples=4,
            sh_deg=1,
            use_viewdirs=False,
            max_deg_point=4,
            compute_dtype="bfloat16",
        )
        cfg0 = default_config(**base)
        cfg1 = default_config(use_pallas=True, **base)
        model0, variables = construct_nerf(random.PRNGKey(0), cfg0)
        model1, _ = construct_nerf(random.PRNGKey(0), cfg1)
        rng = np.random.default_rng(5)
        d = rng.normal(size=(16, 3)).astype(np.float32)
        rays = Rays(
            origins=jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)),
            directions=jnp.asarray(d),
            viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
        )
        k0, k1 = random.PRNGKey(1), random.PRNGKey(2)

        def render(model):
            return model.apply(variables, k0, k1, rays, False)

        r0, r1 = render(model0), render(model1)
        for (a, _, _), (b, _, _) in zip(r0, r1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-2
            )

        def loss(model, v):
            ret = model.apply(v, k0, k1, rays, False)
            return sum(jnp.sum(r[0] ** 2) for r in ret)

        g0 = jax.grad(lambda v: loss(model0, v))(variables)
        g1 = jax.grad(lambda v: loss(model1, v))(variables)
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_leaves_with_path(g1)
        )
        for path, leaf in flat0:
            key = jax.tree_util.keystr(path)
            a, b = np.asarray(leaf), np.asarray(flat1[key])
            scale = np.abs(a).max() + 1e-9
            assert np.abs(a - b).max() / scale < 0.08, key

    def test_posenc_forward_matches_flax(self, small_mlp):
        # In-kernel positional encoding: raw [N, 3] coords in, must equal
        # XLA posenc + flax trunk. d_in 21 = 3 * (1 + 2*3) -> posenc (0, 3).
        from plenoctree_tpu.ops import posenc

        mlp, variables = small_mlp
        rng = np.random.default_rng(6)
        pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2, posenc=(0, 3))
        assert meta["x_dim"] == 3
        fused = make_fused_trunk(meta)
        out_sigma, out_rgb = fused(flat, pts)
        xs = posenc(pts, 0, 3)
        rgb, sigma = mlp.apply(variables, xs[:, None, :])
        np.testing.assert_allclose(
            np.asarray(out_rgb), np.asarray(rgb.reshape(-1, 12)),
            atol=2e-2, rtol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out_sigma), np.asarray(sigma.reshape(-1, 1)),
            atol=2e-2, rtol=2e-2,
        )

    def test_posenc_grads_match_flax(self, small_mlp):
        # Split-layer weight grads (layer 0, post-skip layers, split head)
        # must reassemble to the flax grads of the encoded-input layers.
        from plenoctree_tpu.ops import posenc

        mlp, variables = small_mlp
        rng = np.random.default_rng(7)
        pts = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        gt = jnp.asarray(rng.normal(size=(64, 13)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2, posenc=(0, 3))
        fused = make_fused_trunk(meta)

        def loss_fused(fw):
            sg, rgb = fused(fw, pts)
            return jnp.vdot(jnp.concatenate([sg, rgb], -1), gt)

        gf = jax.grad(loss_fused)(tuple(flat))

        def loss_flax(params):
            xs = posenc(pts, 0, 3)
            rgb, sg = mlp.apply({"params": params}, xs[:, None, :])
            out = jnp.concatenate([sg.reshape(-1, 1), rgb.reshape(-1, 12)], -1)
            return jnp.vdot(out, gt)

        gx = jax.grad(loss_flax)(variables["params"])
        names = sorted(gx.keys(), key=lambda k: int(k.split("_")[1]))
        depth = len(names) - 2
        for i in range(depth):
            k = np.asarray(gx[names[i]]["kernel"])
            kf = np.asarray(gf[2 * i])
            assert kf.shape == k.shape, f"layer {i} grad shape"
            scale = np.abs(k).max() + 1e-9
            assert np.abs(kf - k).max() / scale < 0.05, f"layer {i} kernel"
            b = np.asarray(gx[names[i]]["bias"])
            bf = np.asarray(gf[2 * i + 1])[0]
            assert np.abs(bf - b).max() / (np.abs(b).max() + 1e-9) < 0.05, i
        hk = np.concatenate(
            [
                np.asarray(gx[names[depth]]["kernel"]),
                np.asarray(gx[names[depth + 1]]["kernel"]),
            ],
            axis=1,
        )
        hkf = np.asarray(gf[2 * depth])
        assert hkf.shape == hk.shape
        assert np.abs(hkf - hk).max() / (np.abs(hk).max() + 1e-9) < 0.05

    def test_posenc_decode_combined(self, small_mlp):
        # posenc + in-epilogue SH decode together (the training configuration).
        from plenoctree_tpu.ops import posenc

        mlp, variables = small_mlp
        rng = np.random.default_rng(8)
        pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        basis = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
        flat, meta = pack_params(variables["params"], skip_layer=2, posenc=(0, 3))
        meta = dict(meta, sh_dim=4)
        fused = make_fused_trunk(meta)
        out_sigma, out_rgb = fused(flat, pts, basis)
        assert out_rgb.shape == (100, 3)
        xs = posenc(pts, 0, 3)
        rgb, sigma = mlp.apply(variables, xs[:, None, :])
        ref_rgb = jnp.einsum("nck,nk->nc", rgb.reshape(-1, 3, 4), basis)
        np.testing.assert_allclose(
            np.asarray(out_rgb), np.asarray(ref_rgb), atol=5e-2, rtol=5e-2
        )

    def test_traced_packing_matches_numpy_packing(self, small_mlp):
        _, variables = small_mlp
        params = variables["params"]
        flat_np, meta_np = pack_params(params, skip_layer=2)
        names = sorted(params.keys(), key=lambda k: int(k.split("_")[1]))
        kernels = [params[n]["kernel"] for n in names]
        biases = [params[n]["bias"] for n in names]
        flat_tr, meta_tr = pack_params_traced(kernels, biases, skip_layer=2)
        assert meta_np == meta_tr
        for a, b in zip(flat_np, flat_tr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
