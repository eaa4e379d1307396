"""Model construction, forward pass, color heads, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from plenoctree_tpu.models import construct_nerf, get_model_state
from plenoctree_tpu.types import Rays
from plenoctree_tpu.utils import checkpoints as ckpt_utils
from plenoctree_tpu.utils.config import default_config


def tiny_config(**kw):
    base = dict(
        net_depth=2,
        net_width=16,
        net_depth_condition=1,
        net_width_condition=8,
        num_coarse_samples=4,
        num_fine_samples=4,
        max_deg_point=4,
        sparsity_npoints=16,
        batch_size=8,
    )
    base.update(kw)
    return default_config(**base)


def make_rays(n=8, seed=0):
    rng = np.random.default_rng(seed)
    origins = rng.normal(size=(n, 3)).astype(np.float32)
    directions = rng.normal(size=(n, 3)).astype(np.float32)
    viewdirs = directions / np.linalg.norm(directions, axis=-1, keepdims=True)
    return Rays(*map(jnp.asarray, (origins, directions, viewdirs)))


class TestConstruct:
    def test_sh_channel_expansion(self):
        cfg = tiny_config(sh_deg=2, use_viewdirs=False)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        assert model.num_rgb_channels == 3 * 9
        # Final dense layer of MLP_0 emits the SH coeffs.
        p = variables["params"]["MLP_0"]
        last = sorted(p.keys(), key=lambda k: int(k.split("_")[1]))[-1]
        assert p[last]["kernel"].shape[-1] == 27

    def test_sg_creates_global_variables(self):
        cfg = tiny_config(sg_dim=4, use_viewdirs=False)
        _, variables = construct_nerf(random.PRNGKey(0), cfg)
        assert variables["params"]["sg_lambda"].shape == (4,)
        assert variables["params"]["sg_mu_spher"].shape == (4, 2)

    def test_mutual_exclusion_asserts(self):
        with pytest.raises(AssertionError):
            construct_nerf(random.PRNGKey(0), tiny_config(sh_deg=2, use_viewdirs=True))

    def test_bad_rgb_activation_rejected(self):
        with pytest.raises(NotImplementedError):
            construct_nerf(random.PRNGKey(0), tiny_config(rgb_activation="relu"))

    def test_jaxnerf_layer_naming(self):
        cfg = tiny_config(use_viewdirs=True)
        _, variables = construct_nerf(random.PRNGKey(0), cfg)
        names = set(variables["params"]["MLP_0"].keys())
        # depth=2 trunk + sigma + bottleneck + 1 condition + rgb = Dense_0..5
        assert names == {f"Dense_{i}" for i in range(6)}


class TestForward:
    @pytest.mark.parametrize(
        "head", [dict(sh_deg=2, use_viewdirs=False), dict(use_viewdirs=True),
                 dict(sg_dim=3, use_viewdirs=False)]
    )
    def test_full_forward_shapes_and_ranges(self, head):
        cfg = tiny_config(**head)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        rays = make_rays()
        ret = model.apply(variables, random.PRNGKey(1), random.PRNGKey(2), rays, True)
        assert len(ret) == 2  # coarse + fine
        for rgb, disp, acc in ret:
            assert rgb.shape == (8, 3)
            assert disp.shape == (8,)
            assert acc.shape == (8,)
            rgb = np.asarray(rgb)
            assert np.isfinite(rgb).all()
            # white_bkgd composites of sigmoids stay in [0, 1+eps]
            assert (rgb >= -1e-5).all() and (rgb <= 1.0 + 1e-4).all()

    def test_coarse_only(self):
        cfg = tiny_config(num_fine_samples=0, use_viewdirs=True)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        ret = model.apply(
            variables, random.PRNGKey(1), random.PRNGKey(2), make_rays(), False
        )
        assert len(ret) == 1

    def test_deterministic_when_not_randomized(self):
        cfg = tiny_config(sh_deg=1, use_viewdirs=False)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        rays = make_rays()
        r1 = model.apply(variables, random.PRNGKey(1), random.PRNGKey(2), rays, False)
        r2 = model.apply(variables, random.PRNGKey(7), random.PRNGKey(9), rays, False)
        np.testing.assert_allclose(np.asarray(r1[-1][0]), np.asarray(r2[-1][0]), atol=1e-6)

    def test_eval_points_raw_and_decoded(self):
        cfg = tiny_config(sh_deg=2, use_viewdirs=False)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (5, 1))
        raw_rgb, raw_sigma = model.apply(pts, method=model.eval_points_raw, variables=variables) \
            if False else model.apply(variables, pts, method=model.eval_points_raw)
        assert raw_rgb.shape == (5, 27)
        assert raw_sigma.shape == (5, 1)
        rgb, sigma = model.apply(variables, pts, dirs, method=model.eval_points)
        assert rgb.shape == (5, 3)
        assert (np.asarray(sigma) >= 0).all()
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


class TestCheckpoints:
    def test_roundtrip(self, tmp_path):
        cfg = tiny_config(sh_deg=1, use_viewdirs=False, train_dir=str(tmp_path))
        model, state = get_model_state(random.PRNGKey(0), cfg, restore=False)
        state = state.replace(step=42)
        ckpt_utils.save_checkpoint(str(tmp_path), state, 42)
        assert ckpt_utils.latest_checkpoint_step(str(tmp_path)) == 42

        _, state2 = get_model_state(random.PRNGKey(1), cfg, restore=True)
        assert int(state2.step) == 42
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            state.variables,
            state2.variables,
        )

    def test_import_reference_layout(self, tmp_path):
        # Build a fake original-JaxNeRF checkpoint: optimizer/target/params.
        cfg = tiny_config(sh_deg=1, use_viewdirs=False, train_dir=str(tmp_path))
        model, state = get_model_state(random.PRNGKey(0), cfg, restore=False)
        fake_ref = {
            "optimizer": {
                "state": {"step": 1234},
                "target": {"params": jax.device_get(state.variables["params"])},
            }
        }
        from flax.training import checkpoints as fc

        fc.save_checkpoint(str(tmp_path), fake_ref, 1234, keep=2)
        _, state2 = get_model_state(random.PRNGKey(1), cfg, restore=True)
        assert int(state2.step) == 1234
        np.testing.assert_allclose(
            np.asarray(
                jax.tree_util.tree_leaves(state2.variables["params"])[0]
            ),
            np.asarray(jax.tree_util.tree_leaves(state.variables["params"])[0]),
        )
