"""N3Tree structure, npz round-trip, differentiable renderer, optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plenoctree_tpu.data.synthetic import (
    render_synthetic_scene,
    scene_sigma_rgb,
)
from plenoctree_tpu.octree import N3Tree, DataFormat
from plenoctree_tpu.octree import renderer as renderer_lib
from plenoctree_tpu.octree.renderer import RenderOptions, VolumeRenderer, render_rays
from plenoctree_tpu.ops.metrics import compute_psnr
from plenoctree_tpu.ops.sh import SH_C0


def build_scene_tree(depth=4, data_format="SH1"):
    """Bake the analytic synthetic scene into an octree at given depth.

    SH deg 0: coeff = logit(rgb)/C0 so sigmoid(C0 * coeff) = rgb.
    """
    tree = N3Tree(
        data_dim=4 if data_format in ("SH1", "RGBA") else None,
        depth_limit=depth,
        radius=1.2,
        center=(0.0, 0.0, 0.0),
        data_format=data_format,
        init_reserve=1000,
    )
    # Refine everywhere the scene has density.
    reso = 2 ** (depth + 1)
    arr = (np.arange(reso) + 0.5) / reso
    grid_t = np.stack(np.meshgrid(arr, arr, arr, indexing="ij"), -1).reshape(-1, 3)
    grid_w = tree.tree2world(grid_t)
    sigma, _ = scene_sigma_rgb(grid_w)
    occupied = grid_w[sigma > 0.05]
    for _ in range(depth):
        tree.refine_points(occupied)
    assert tree.max_depth == depth

    # Fill leaf data from the analytic field.
    depths = tree.depths
    leaf_ind = np.nonzero(depths == depth)[0]
    centers_w = tree.tree2world(tree.leaf_centers()[leaf_ind])
    sigma, rgb = scene_sigma_rgb(centers_w)
    rgbc = np.clip(rgb, 1e-4, 1 - 1e-4)
    coeff = np.log(rgbc / (1 - rgbc)) / SH_C0  # inverse sigmoid, deg-0 SH
    data = np.concatenate([coeff, sigma[:, None]], -1).astype(np.float32)
    tree.set_leaf_data(leaf_ind, data)
    return tree


@pytest.fixture(scope="module")
def scene_tree():
    return build_scene_tree()


class TestN3Tree:
    def test_refine_and_depths(self):
        tree = N3Tree(data_dim=4, depth_limit=3, radius=1.0, center=(0, 0, 0))
        pts = np.array([[0.1, 0.1, 0.1]], np.float32)
        for _ in range(3):
            tree.refine_points(pts)
        assert tree.max_depth == 3
        assert tree.n_internal == 4  # root + one node per level

    def test_depth_limit_respected(self):
        tree = N3Tree(data_dim=4, depth_limit=2, radius=1.0, center=(0, 0, 0))
        pts = np.array([[0.0, 0.0, 0.0]], np.float32)
        for _ in range(5):
            tree.refine_points(pts)
        assert tree.max_depth == 2

    def test_query_finds_refined_cell(self):
        tree = N3Tree(data_dim=4, depth_limit=3, radius=1.0, center=(0, 0, 0))
        pts = np.array([[0.3, -0.2, 0.6]], np.float32)
        for _ in range(3):
            tree.refine_points(pts)
        node, cell, depth = tree.query_points(pts)
        assert depth[0] == 3

    def test_leaf_centers_contain_points(self, scene_tree):
        # every leaf center queries back to a leaf whose cube contains it
        centers = scene_tree.leaf_centers()
        leaves = scene_tree._leaf_nodes()
        corner = scene_tree._cell_corner(leaves)
        size = scene_tree._cell_size(leaves)
        assert (centers >= corner - 1e-6).all()
        assert (centers <= corner + size[:, None] + 1e-6).all()

    def test_sample_points_inside_cells(self, scene_tree):
        idx = np.arange(10)
        pts = scene_tree.leaf_sample_points(idx, 16, np.random.default_rng(0))
        t = scene_tree.world2tree(pts.reshape(-1, 3))
        assert (t >= 0).all() and (t <= 1).all()

    def test_save_load_roundtrip(self, scene_tree, tmp_path):
        pth = str(tmp_path / "tree.npz")
        scene_tree.save(pth, compress=False)
        t2 = N3Tree.load(pth)
        assert t2.n_internal == scene_tree.n_internal
        assert t2.data_dim == scene_tree.data_dim
        assert repr(t2.data_format) == repr(scene_tree.data_format)
        np.testing.assert_array_equal(t2.child, scene_tree.child[: scene_tree.n_internal])
        np.testing.assert_allclose(
            t2.data, scene_tree.data[: scene_tree.n_internal], rtol=1e-3, atol=2e-3
        )  # fp16 storage
        np.testing.assert_allclose(t2.invradius, scene_tree.invradius)

    def test_npz_keys_svox_compatible(self, scene_tree, tmp_path):
        pth = str(tmp_path / "tree.npz")
        scene_tree.save(pth)
        z = np.load(pth)
        for key in [
            "data", "child", "parent_depth", "n_internal", "n_free",
            "invradius3", "offset", "depth_limit", "geom_resize_fact",
            "data_format", "data_dim",
        ]:
            assert key in z.files, key
        assert z["data"].dtype == np.float16
        assert str(z["data_format"]) == "SH1"

    def test_data_format_parse(self):
        assert DataFormat("SH16").basis_dim == 16
        assert DataFormat("SH16").sh_deg == 3
        assert DataFormat("SG25").basis_dim == 25
        assert DataFormat(None).format == "RGBA"
        with pytest.raises(ValueError):
            DataFormat("SH15")


class TestRenderer:
    def test_render_matches_analytic_scene(self, scene_tree):
        # Render a held-out view from the octree; compare to the analytic
        # ground truth. Coarse tree (reso 32) -> expect moderate PSNR.
        images, c2ws, focal = render_synthetic_scene("test", 1, 40, True, 2.0, 6.0)
        r = VolumeRenderer(scene_tree, step_size=1e-3)
        im = r.render_persp(c2ws[0], height=40, width=40, fx=focal)
        psnr = float(compute_psnr(np.mean((np.clip(im, 0, 1) - images[0]) ** 2)))
        assert psnr > 16.0, psnr

    def test_empty_tree_renders_background(self):
        tree = N3Tree(data_dim=4, depth_limit=2, radius=1.0, center=(0, 0, 0), data_format="SH1")
        r = VolumeRenderer(tree, step_size=1e-3)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0
        im = r.render_persp(c2w, height=8, width=8, fx=8.0)
        np.testing.assert_allclose(im, 1.0, atol=1e-4)

    def test_gradient_flows_to_leaf_data(self, scene_tree):
        arrays = renderer_lib.tree_arrays(scene_tree)
        data = arrays.pop("data")
        opts = RenderOptions(step_size=1e-3, max_segments=64)
        o = jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32)
        d = jnp.asarray([[0.05, 0.02, -1.0]], jnp.float32)

        def loss(data):
            rgb = render_rays(
                dict(arrays, data=data), o, d, "SH", 1, scene_tree.max_depth, opts
            )
            return jnp.sum(rgb)

        g = jax.grad(loss)(data)
        assert float(jnp.abs(g).sum()) > 0
        # Gradient touches only leaves along this one ray: sparse.
        touched = int((jnp.abs(g).sum(-1) > 0).sum())
        assert 0 < touched < 200

    def test_multipass_matches_full_scan(self, scene_tree):
        # Pass-level early termination must not change the rendered image.
        import jax.numpy as jnp

        from plenoctree_tpu.octree.renderer import (
            RenderOptions,
            render_rays,
            tree_arrays,
        )

        rng = np.random.default_rng(3)
        origins = np.tile([[0.0, 0.0, 3.2]], (64, 1)).astype(np.float32)
        dirs = rng.normal(scale=0.15, size=(64, 3)).astype(np.float32)
        dirs[:, 2] = -1.0
        r = VolumeRenderer(scene_tree, step_size=1e-3, segs_per_pass=8)
        out_mp = r.render_rays_early_stop(origins, dirs, fast=False)
        arrays = tree_arrays(scene_tree)
        opts = RenderOptions(step_size=1e-3, max_segments=96)
        out_full = np.asarray(
            render_rays(
                arrays,
                jnp.asarray(origins),
                jnp.asarray(dirs),
                "SH",
                1,
                scene_tree.max_depth,
                opts,
            )
        )
        np.testing.assert_allclose(out_mp, out_full, atol=1e-4)

    def test_fast_mode_close_to_exact(self, scene_tree):
        images, c2ws, focal = render_synthetic_scene("test", 1, 24, True, 2.0, 6.0)
        r = VolumeRenderer(scene_tree, step_size=1e-3)
        exact = r.render_persp(c2ws[0], 24, 24, focal, fast=False)
        fast = r.render_persp(c2ws[0], 24, 24, focal, fast=True)
        assert np.abs(exact - fast).mean() < 0.02

    def test_optimization_improves_psnr(self):
        # Degrade the scene tree's colors, then fine-tune on analytic images.
        from plenoctree_tpu.octree.optimize import optimize_tree
        from plenoctree_tpu.utils.config import default_config

        tree = build_scene_tree(depth=3)
        n = tree.n_internal
        tree.data[:n, ..., :3] = 0.0  # wash all colors to gray
        images, c2ws, focal = render_synthetic_scene("train", 5, 24, True, 2.0, 6.0)
        cfg = default_config(renderer_step_size=1e-3)
        r0 = VolumeRenderer(tree, step_size=1e-3)
        im0 = np.clip(r0.render_persp(c2ws[4], 24, 24, focal), 0, 1)
        psnr0 = float(compute_psnr(np.mean((im0 - images[4]) ** 2)))
        best_tree, best_psnr = optimize_tree(
            tree,
            c2ws[:4],
            images[:4],
            c2ws[4:],
            images[4:],
            focal,
            cfg,
            num_epochs=4,
            lr=3e4,
            use_sgd=True,
            val_interval=1,
            continue_on_decrease=True,
            chunk=24 * 24,
        )
        assert best_tree is not None
        assert best_psnr > psnr0 + 2.0, (psnr0, best_psnr)


class TestGenericBranchFactor:
    """svox's N3Tree is generic in N (reference --tree_branch_n,
    octree/extraction.py:100-105); so are our tree + renderer."""

    def _tiny_tree(self, N):
        tree = N3Tree(
            N=N,
            data_dim=4,
            depth_limit=2,
            radius=1.0,
            center=(0, 0, 0),
            data_format="SH1",
            init_reserve=64,
        )
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.9, 0.9, size=(40, 3)).astype(np.float32)
        for _ in range(2):
            tree.refine_points(pts)
        depths = tree.depths
        leaf_ind = np.nonzero(depths >= 0)[0]
        centers = tree.tree2world(tree.leaf_centers())
        sigma, rgb = scene_sigma_rgb(centers)
        rgbc = np.clip(rgb, 1e-4, 1 - 1e-4)
        coeff = np.log(rgbc / (1 - rgbc)) / SH_C0
        tree.set_leaf_data(
            leaf_ind, np.concatenate([coeff, sigma[:, None]], -1).astype(np.float32)
        )
        return tree

    def test_n3_query_roundtrip(self):
        tree = self._tiny_tree(3)
        assert tree.N == 3
        centers = tree.leaf_centers()
        node, cell, depth = tree.query_points(centers, world=False)
        leaves = tree._leaf_nodes()
        np.testing.assert_array_equal(node, leaves[:, 0])
        np.testing.assert_array_equal(cell, leaves[:, 1:])

    def test_n3_save_load(self, tmp_path):
        tree = self._tiny_tree(3)
        pth = str(tmp_path / "tree3.npz")
        tree.save(pth, compress=False)
        t2 = N3Tree.load(pth)
        assert t2.N == 3
        assert t2.n_internal == tree.n_internal

    def test_n3_render_matches_oracle_no_accel(self):
        # Deferred pipeline (accel grid) vs full-scan descent (no accel),
        # both at N=3: agreement pins the N-generic descent + grid packing.
        tree = self._tiny_tree(3)
        rng = np.random.default_rng(1)
        origins = np.tile([[0.0, 0.0, 3.0]], (32, 1)).astype(np.float32)
        dirs = rng.normal(scale=0.2, size=(32, 3)).astype(np.float32)
        dirs[:, 2] = -1.0
        r = VolumeRenderer(tree, step_size=1e-3)
        out = r.render_rays_early_stop(origins, dirs)
        arrays = renderer_lib.tree_arrays(tree, accel=False)
        opts = RenderOptions(step_size=1e-3, max_segments=64)
        oracle = np.asarray(
            render_rays(
                arrays,
                jnp.asarray(origins),
                jnp.asarray(dirs),
                "SH",
                1,
                tree.max_depth,
                opts,
            )
        )
        np.testing.assert_allclose(out, oracle, atol=1e-4)


class TestAccelBudget:
    def test_budgeted_grid_matches_full(self, scene_tree):
        # A byte budget that forces a coarser grid (internal-pointer voxels
        # + residual descent) must not change the image.
        rng = np.random.default_rng(2)
        origins = np.tile([[0.0, 0.0, 3.2]], (64, 1)).astype(np.float32)
        dirs = rng.normal(scale=0.15, size=(64, 3)).astype(np.float32)
        dirs[:, 2] = -1.0
        full = VolumeRenderer(scene_tree, step_size=1e-3)
        assert full.arrays["accel_level"] == scene_tree.max_depth + 1
        tiny_budget = 4 * (2 ** (3 * 2)) * 8  # allows only a 2^2 grid
        capped = VolumeRenderer(
            scene_tree, step_size=1e-3, accel_bytes_budget=tiny_budget
        )
        assert capped.arrays["accel_level"] < full.arrays["accel_level"]
        out_full = full.render_rays_early_stop(origins, dirs)
        out_capped = capped.render_rays_early_stop(origins, dirs)
        np.testing.assert_allclose(out_capped, out_full, atol=1e-4)

    def test_deep_tree_keeps_accel(self):
        # Depth beyond MAX_ACCEL_RESO must fall back to a budgeted grid,
        # not lose acceleration entirely (round-1 review weak #7).
        tree = N3Tree(
            data_dim=4,
            depth_limit=9,
            radius=1.0,
            center=(0, 0, 0),
            data_format="SH1",
            init_reserve=64,
        )
        pts = np.array([[0.3, 0.3, 0.3]], np.float32)
        for _ in range(9):
            tree.refine_points(pts)
        arrays = renderer_lib.tree_arrays(tree)
        assert arrays["accel"] is not None
        assert arrays["accel_reso"] <= renderer_lib.MAX_ACCEL_RESO
        assert arrays["accel_level"] < tree.max_depth + 1
