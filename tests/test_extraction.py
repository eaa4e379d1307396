"""Extraction pipeline, grid weights, SH projection, quantization."""

import numpy as np
import pytest

from plenoctree_tpu.data.synthetic import render_synthetic_scene, scene_sigma_rgb
from plenoctree_tpu.octree import N3Tree
from plenoctree_tpu.octree import extract as extract_lib
from plenoctree_tpu.octree.grid_weight import calculate_grid_weights
from plenoctree_tpu.octree.quantize import quantize_median_cut, compress_tree_npz
from plenoctree_tpu.octree.renderer import VolumeRenderer
from plenoctree_tpu.ops import sh_project
from plenoctree_tpu.ops.metrics import compute_psnr
from plenoctree_tpu.ops.sh import SH_C0
from plenoctree_tpu.utils.config import default_config


def analytic_points_fn(points, viewdirs=None):
    """Mimic a trained NeRF-SH deg-0 model with the analytic scene field."""
    pts = np.asarray(points)
    sigma, rgb = scene_sigma_rgb(pts)
    rgbc = np.clip(rgb, 1e-4, 1 - 1e-4)
    coeffs = np.log(rgbc / (1 - rgbc)) / SH_C0
    return coeffs.astype(np.float32), sigma[:, None].astype(np.float32)


class _FakeDataset:
    def __init__(self, n_views=4, res=32):
        _, c2ws, focal = render_synthetic_scene("train", n_views, res, True, 2.0, 6.0)
        self.camtoworlds = c2ws
        self.focal = focal
        self.w = self.h = res
        self.size = n_views


def extraction_cfg(**kw):
    base = dict(
        sh_deg=0,
        use_viewdirs=False,
        init_grid_depth=4,
        chunk=16384,
        alpha_thresh=0.01,
        masking_mode="sigma",
        samples_per_cell=4,
        renderer_step_size=1e-3,
        center="0 0 0",
        radius="1.2",
        num_rgb_channels=3,
    )
    base.update(kw)
    return default_config(**base)


class TestExtraction:
    @pytest.mark.parametrize("masking_mode", ["sigma", "weight"])
    def test_full_extraction_renders_scene(self, masking_mode):
        cfg = extraction_cfg(masking_mode=masking_mode)
        tree = N3Tree(
            data_dim=4,
            depth_limit=cfg.init_grid_depth,
            radius=1.2,
            center=(0, 0, 0),
            data_format="SH1",
            init_reserve=1000,
        )
        ds = _FakeDataset()
        extract_lib.step1_build(cfg, tree, analytic_points_fn, ds)
        extract_lib.step2_fill(cfg, tree, analytic_points_fn)
        tree.relu_sigma_()
        tree.shrink_to_fit()

        images, c2ws, focal = render_synthetic_scene("test", 1, 32, True, 2.0, 6.0)
        r = VolumeRenderer(tree, step_size=1e-3)
        im = np.clip(r.render_persp(c2ws[0], 32, 32, focal), 0, 1)
        psnr = float(compute_psnr(np.mean((im - images[0]) ** 2)))
        assert psnr > 16.0, (masking_mode, psnr)

    def test_autoscale_shrinks_to_support(self):
        cfg = extraction_cfg()
        center, radius = extract_lib.auto_scale(
            cfg, [0.0, 0.0, 0.0], [2.5, 2.5, 2.5], analytic_points_fn
        )
        # Blobs live within ~[-0.85, 0.85]; autoscale must tighten the bbox.
        assert all(r < 1.5 for r in radius), radius
        assert all(abs(c) < 0.5 for c in center), center


class TestGridWeights:
    def test_visible_voxels_get_weight(self):
        reso = 32
        # Dense sigma grid of the analytic scene over the tree volume.
        invradius = np.full(3, 0.5 / 1.2, np.float32)
        offset = np.full(3, 0.5, np.float32)
        arr = (np.arange(reso) + 0.5) / reso
        t = np.stack(np.meshgrid(arr, arr, arr, indexing="ij"), -1).reshape(-1, 3)
        world = (t - offset) / invradius
        sigma, _ = scene_sigma_rgb(world)
        w = calculate_grid_weights(
            _FakeDataset(), sigma, reso, invradius, offset, chunk=4096
        )
        assert w.shape == (reso, reso, reso)
        # Some surface voxels of the blobs are clearly visible.
        assert w.max() > 0.3
        # Corners are empty space: negligible weight.
        assert w[0, 0, 0] < 1e-4
        # Deep inside the central blob occlusion kills the weight: the blob
        # center must be far below the global surface maximum.
        assert w[reso // 2, reso // 2, reso // 2] < 0.1 * w.max()
        # The visibility mask is sparse overall.
        assert (w > 0.001).mean() < 0.5


class TestSHProjection:
    def test_projection_recovers_constant_function(self):
        # f(d) = c for all dirs -> only the DC SH coefficient is nonzero.
        def fn(dirs):
            vals = np.tile([[0.3, 0.6, 0.9]], (dirs.shape[0], 1))[None]  # [1, S, 3]
            return vals, np.ones((1, 1), np.float32)

        coeffs, _ = sh_project.project_function_nerf(
            2, fn, 20000, np.random.default_rng(0)
        )
        # DC: c / C0 (integral of Y0 over sphere = C0 * 4pi).
        np.testing.assert_allclose(
            coeffs[0, :, 0], np.array([0.3, 0.6, 0.9]) / (4 * np.pi * SH_C0) * (4 * np.pi),
            rtol=0.05,
        )
        assert np.abs(coeffs[0, :, 1:]).max() < 0.05

    def test_sparse_projection_matches_mc(self):
        rng = np.random.default_rng(1)
        true_coeffs = rng.normal(size=(1, 3, 9)).astype(np.float32)

        def fn(dirs):
            from plenoctree_tpu.ops.sh import sh_basis

            basis = np.asarray(sh_basis(2, dirs))
            return np.einsum("pck,sk->psc", true_coeffs, basis), None

        coeffs, _ = sh_project.project_function_nerf_sparse(2, fn, 500, rng)
        np.testing.assert_allclose(coeffs, true_coeffs, atol=1e-3)


class TestQuantize:
    def test_few_distinct_colors_near_exact(self):
        # Vanilla median cut splits boxes at the count median, which need not
        # align with color-cluster boundaries — expect near-exact (the
        # reference CUDA median cut has the same property).
        rng = np.random.default_rng(0)
        palette_true = rng.random((4, 3)).astype(np.float32)
        ids_true = rng.integers(0, 4, 1000)
        colors = palette_true[ids_true]
        palette, ids = quantize_median_cut(colors, bits=8)
        recon = palette[ids]
        err = np.abs(recon - colors).max(-1)
        assert (err < 1e-5).mean() > 0.98
        assert err.mean() < 0.01

    def test_quantization_error_shrinks_with_bits(self):
        rng = np.random.default_rng(1)
        colors = rng.random((5000, 3)).astype(np.float32)
        errs = []
        for bits in (2, 4, 8):
            palette, ids = quantize_median_cut(colors, bits=bits)
            errs.append(np.abs(palette[ids] - colors).mean())
        assert errs[0] > errs[1] > errs[2]

    def test_compress_tree_roundtrip(self, tmp_path):
        from test_octree import build_scene_tree

        tree = build_scene_tree(depth=3)
        src = str(tmp_path / "tree.npz")
        dst = str(tmp_path / "tree_c.npz")
        tree.save(src, compress=False)
        assert compress_tree_npz(src, dst, bits=8, sigma_thresh=0.5)
        z = np.load(dst)
        for key in ("quant_colors", "quant_map", "sigma", "child", "data_format"):
            assert key in z.files, key
        for key in ("parent_depth", "n_internal", "data"):
            assert key not in z.files, key
        import os

        assert os.path.getsize(dst) < os.path.getsize(src)
