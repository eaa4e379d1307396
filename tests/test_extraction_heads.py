"""Extraction paths for the SG head and the vanilla-NeRF SH projection
(use_viewdirs) — end-to-end against tiny real models."""

import jax
import numpy as np
import pytest
from jax import random

from plenoctree_tpu import engine
from plenoctree_tpu.data.synthetic import render_synthetic_scene
from plenoctree_tpu.models import construct_nerf
from plenoctree_tpu.octree import N3Tree
from plenoctree_tpu.octree import extract as extract_lib
from plenoctree_tpu.octree.renderer import VolumeRenderer
from plenoctree_tpu.utils.config import default_config


def tiny_model_cfg(**kw):
    base = dict(
        net_depth=2,
        net_width=16,
        net_width_condition=8,
        num_coarse_samples=4,
        num_fine_samples=4,
        max_deg_point=4,
        chunk=4096,
        init_grid_depth=3,
        alpha_thresh=0.0,
        masking_mode="sigma",
        samples_per_cell=2,
        renderer_step_size=1e-3,
        num_rgb_channels=3,
        projection_samples=64,
    )
    base.update(kw)
    return default_config(**base)


def run_extraction(cfg, data_format, extra_data=None):
    model, variables = construct_nerf(random.PRNGKey(0), cfg)
    points_fn_jit = engine.make_eval_points_fn(model, raw_rgb=True)
    points_fn = lambda p, v: points_fn_jit(variables, p, v)
    points_fn_cross = None
    if cfg.use_viewdirs:
        cross_jit = jax.jit(
            lambda p, d: model.apply(variables, p, d, method=model.eval_points_cross)
        )
        points_fn_cross = lambda p, d: jax.device_get(cross_jit(p, d))

    num_rgb = cfg.num_rgb_channels
    if cfg.sh_deg >= 0:
        num_rgb *= (cfg.sh_deg + 1) ** 2
    elif cfg.sg_dim > 0:
        num_rgb *= cfg.sg_dim
    tree = N3Tree(
        data_dim=1 + num_rgb,
        depth_limit=cfg.init_grid_depth,
        radius=1.3,
        center=(0, 0, 0),
        data_format=data_format,
        extra_data=extra_data,
        init_reserve=100,
    )
    extract_lib.step1_build(cfg, tree, points_fn, dataset=None)
    extract_lib.step2_fill(cfg, tree, points_fn, points_fn_cross)
    tree.relu_sigma_()
    tree.shrink_to_fit()
    return model, variables, tree


class TestSGExtraction:
    def test_sg_tree_builds_and_renders(self):
        cfg = tiny_model_cfg(sg_dim=4, use_viewdirs=False)
        model, variables, tree = run_extraction(
            cfg,
            f"SG{cfg.sg_dim}",
            extra_data=np.concatenate(
                [np.ones((4, 1), np.float32), np.eye(4, 3, dtype=np.float32)], axis=-1
            ),
        )
        assert repr(tree.data_format) == "SG4"
        assert tree.data_dim == 13
        r = VolumeRenderer(tree, step_size=1e-3)
        im = r.render_persp(np.eye(4, dtype=np.float32) + 0, 8, 8, 8.0)
        assert np.isfinite(im).all()

    def test_sg_extra_data_roundtrip(self, tmp_path):
        cfg = tiny_model_cfg(sg_dim=4, use_viewdirs=False)
        extra = np.concatenate(
            [np.full((4, 1), 2.0, np.float32), np.eye(4, 3, dtype=np.float32)], -1
        )
        _, _, tree = run_extraction(cfg, "SG4", extra_data=extra)
        p = str(tmp_path / "sg.npz")
        tree.save(p)
        t2 = N3Tree.load(p)
        np.testing.assert_allclose(t2.extra_data, extra)


class TestProjectionExtraction:
    def test_vanilla_nerf_projects_to_sh(self):
        # use_viewdirs model + sh_deg set only for the octree target format:
        # construct with viewdirs, then project onto SH deg 1.
        cfg = tiny_model_cfg(use_viewdirs=True, sh_deg=-1)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        cross_jit = jax.jit(
            lambda p, d: model.apply(variables, p, d, method=model.eval_points_cross)
        )
        points_fn_cross = lambda p, d: jax.device_get(cross_jit(p, d))

        pts = np.random.default_rng(0).uniform(-1, 1, (10, 3)).astype(np.float32)
        coeffs, sigma = extract_lib.project_nerf_to_sh(
            points_fn_cross, 1, pts, projection_samples=128
        )
        assert coeffs.shape == (10, 3 * 4)
        assert sigma.shape == (10, 1)
        assert np.isfinite(coeffs).all()

    def test_projected_dc_matches_mean_color(self):
        # The DC SH coefficient decodes to the spherical mean of the raw rgb.
        from plenoctree_tpu.ops.sh import SH_C0

        cfg = tiny_model_cfg(use_viewdirs=True, sh_deg=-1)
        model, variables = construct_nerf(random.PRNGKey(0), cfg)
        cross_jit = jax.jit(
            lambda p, d: model.apply(variables, p, d, method=model.eval_points_cross)
        )
        points_fn_cross = lambda p, d: jax.device_get(cross_jit(p, d))
        pts = np.zeros((1, 3), np.float32)
        rng = np.random.default_rng(3)
        coeffs, _ = extract_lib.project_nerf_to_sh(
            points_fn_cross, 2, pts, projection_samples=4000, rng=rng
        )
        coeffs = coeffs.reshape(1, 3, 9)
        from plenoctree_tpu.ops.sh_project import spherical_uniform_dirs

        dirs = spherical_uniform_dirs(4000, np.random.default_rng(9))
        raw_rgb, _ = points_fn_cross(pts, dirs)
        mean_rgb = np.asarray(raw_rgb).mean(axis=1)[0]
        np.testing.assert_allclose(
            coeffs[0, :, 0] * SH_C0, mean_rgb, rtol=0.1, atol=0.02
        )
