"""Differentiable tile optimizer (octree/tile_opt.py): gradient correctness
via finite differences, forward/loss consistency, and SGD descent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plenoctree_tpu.octree.tile_opt import TileOptimizer, optimize_tree_tiles
from plenoctree_tpu.octree.tile_render import TileRenderer

from tests.test_octree import build_scene_tree, render_synthetic_scene
from tests.test_tile_render import _psnr


H = W = 32
FX = 1.1 * W


def orbit_pose(theta=0.5, radius=2.4, height=0.9):
    cam = np.array([radius * np.cos(theta), radius * np.sin(theta), height],
                   np.float32)
    fwd = -cam / np.linalg.norm(cam)
    up = np.array([0, 0, 1], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = -np.cross(right, fwd)
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = cam
    return c2w


@pytest.fixture(scope="module")
def setup():
    tree = build_scene_tree(depth=3)
    opt = TileOptimizer(tree, step_size=1e-3, grid_c=8, rcap=128)
    leaf = opt.initial_leaf_dataT()
    c2w = orbit_pose()
    # Ground truth: the serving renderer's own exact-mode output on the
    # original data, slightly perturbed so the loss/gradient are nonzero.
    img0, _, _, _ = opt.render(leaf, c2w, H, W, FX)
    rng = np.random.default_rng(3)
    gt = np.clip(img0 + 0.15 * rng.standard_normal(img0.shape), 0, 1).astype(
        np.float32
    )
    return tree, opt, leaf, c2w, gt


class TestTileOpt:
    def test_forward_matches_serving_renderer(self, setup):
        tree, opt, leaf, c2w, gt = setup
        img, _, _, _ = opt.render(leaf, c2w, H, W, FX)
        serve = TileRenderer(tree, step_size=1e-3, grid_c=8, rcap=128,
                             use_bf16=False)
        img_s = serve.render_persp(c2w, H, W, FX)
        assert _psnr(np.clip(img, 0, 1), np.clip(img_s, 0, 1)) > 55.0

    def test_loss_value_matches_render(self, setup):
        tree, opt, leaf, c2w, gt = setup
        (loss, (img, n_max, nc_max, w1o)), grad = opt.loss_and_grad(
            leaf, c2w, gt, H, W, FX
        )
        img2, _, _, _ = opt.render(leaf, c2w, H, W, FX)
        ref = float(np.mean((img2 - gt) ** 2))
        assert abs(float(loss) - ref) < 1e-6
        assert grad.shape == leaf.shape
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0.0

    def test_grad_matches_finite_difference(self, setup):
        tree, opt, leaf, c2w, gt = setup
        (_, _), grad = opt.loss_and_grad(leaf, c2w, gt, H, W, FX)
        grad = np.asarray(grad)
        # Probe the largest-gradient coordinates (well above f32 FD noise)
        # across both sigma (last row) and SH coefficient rows.
        flat = np.argsort(np.abs(grad).ravel())[::-1]
        rng = np.random.default_rng(0)
        picks = list(flat[:3]) + list(rng.choice(flat[3:200], 3, replace=False))
        leaf_np = np.asarray(leaf)
        for pidx in picks:
            r, c = np.unravel_index(pidx, grad.shape)
            # Small relative step: sigma grads ride an exponential, so a
            # coarse step (e.g. 1e-2 * sigma at sigma ~ 50) measures
            # curvature, not the gradient.
            eps = max(1e-4 * abs(leaf_np[r, c]), 1e-4)
            # Fresh buffers per evaluation: jnp.asarray may alias the numpy
            # buffer on the CPU backend, so mutating one array between async
            # dispatches races with the deferred computation.
            lp = leaf_np.copy()
            lp[r, c] += eps
            lm = leaf_np.copy()
            lm[r, c] -= eps
            (lo_p, _), _ = opt.loss_and_grad(jnp.asarray(lp), c2w, gt, H, W, FX)
            (lo_m, _), _ = opt.loss_and_grad(jnp.asarray(lm), c2w, gt, H, W, FX)
            fd = (float(lo_p) - float(lo_m)) / (2 * eps)
            an = grad[r, c]
            # f32 FD noise floor: each loss eval carries ~eps_f32 * loss of
            # rounding noise; the central difference divides it by 2*eps.
            noise = 4 * 1.2e-7 * max(float(lo_p), float(lo_m)) / (2 * eps)
            denom = max(abs(fd), abs(an), 1e-7)
            assert abs(fd - an) < max(0.05 * denom, noise), (r, c, fd, an)

    def test_directional_derivative(self, setup):
        # Full-gradient check with a large signal: the directional
        # derivative along the (normalized) analytic gradient must match
        # grad . direction. Unlike per-coordinate FD, the signal here is
        # the whole gradient norm, far above the f32 noise floor.
        tree, opt, leaf, c2w, gt = setup
        (_, _), grad = opt.loss_and_grad(leaf, c2w, gt, H, W, FX)
        g = np.asarray(grad)
        d = g / np.linalg.norm(g)
        an = float(np.sum(g * d))
        leaf_np = np.asarray(leaf)
        for eps in (1e-3, 3e-4):
            lp = jnp.asarray(leaf_np + eps * d)
            lm = jnp.asarray(leaf_np - eps * d)
            (lo_p, _), _ = opt.loss_and_grad(lp, c2w, gt, H, W, FX)
            (lo_m, _), _ = opt.loss_and_grad(lm, c2w, gt, H, W, FX)
            fd = (float(lo_p) - float(lo_m)) / (2 * eps)
            assert abs(fd - an) / max(abs(fd), abs(an)) < 0.02, (eps, fd, an)

    def test_sgd_descends(self, setup):
        # Realizable target: GT is the render of the TRUE leaf data; start
        # from perturbed data, so the loss can actually approach zero
        # (pixel-noise targets plateau at the irreducible noise floor).
        tree, opt, leaf, c2w, gt = setup
        img_true, _, _, _ = opt.render(leaf, c2w, H, W, FX)
        rng = np.random.default_rng(7)
        leaf_np = np.asarray(leaf)
        pert = leaf_np + 0.3 * rng.standard_normal(leaf_np.shape).astype(
            np.float32
        ) * (1.0 + np.abs(leaf_np))
        cur = jnp.asarray(pert)
        losses = []
        for _ in range(20):
            (loss, _), grad = opt.loss_and_grad(
                cur, c2w, jnp.asarray(img_true), H, W, FX
            )
            losses.append(float(loss))
            cur = cur - 5e3 * grad
        assert losses[-1] < 0.5 * losses[0], losses

    def test_optimize_tree_tiles_improves_psnr(self):
        # Same scenario as test_octree's march-based optimization test:
        # wash the colors, fine-tune on analytic renders, PSNR must recover.
        from plenoctree_tpu.utils.config import default_config

        tree = build_scene_tree(depth=3)
        n = tree.n_internal
        tree.data[:n, ..., :3] = 0.0
        images, c2ws, focal = render_synthetic_scene(
            "train", 5, 32, True, 2.0, 6.0
        )
        cfg = default_config(renderer_step_size=1e-3)
        from plenoctree_tpu.octree.renderer import VolumeRenderer
        from plenoctree_tpu.ops.metrics import compute_psnr

        r0 = VolumeRenderer(tree, step_size=1e-3)
        im0 = np.clip(r0.render_persp(c2ws[4], 32, 32, focal), 0, 1)
        psnr0 = float(compute_psnr(np.mean((im0 - images[4]) ** 2)))
        best_tree, best_psnr = optimize_tree_tiles(
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
            grid_c=8,
        )
        assert best_tree is not None
        assert best_psnr > psnr0 + 2.0, (psnr0, best_psnr)

    def test_grads_match_march_oracle(self, setup):
        """Per-field cosine vs the march optimizer's gradient (VERDICT r4 #4:
        previously a prose claim). The two paths differ in within-chunk hit
        ordering (tile: mean-direction precedence; march: exact per-ray), so
        the pin is cosine >= 0.98 per field, not bitwise."""
        from plenoctree_tpu.data.rays import generate_rays
        from plenoctree_tpu.octree import march as march_lib
        from plenoctree_tpu.octree import renderer as renderer_lib
        from plenoctree_tpu.octree.optimize import TwoPhaseRenderer

        tree, opt, leaf, c2w, gt = setup
        (_, _), g_tileT = opt.loss_and_grad(leaf, c2w, gt, H, W, FX)
        g_tile = np.asarray(g_tileT).T  # [n_kept, D]

        arrays = renderer_lib.tree_arrays(tree)
        opts = renderer_lib.RenderOptions(
            step_size=1e-3,
            max_segments=renderer_lib.default_max_segments(tree),
        )
        rend = TwoPhaseRenderer(
            arrays, tree.data_format.format, tree.data_format.basis_dim,
            opts, K=march_lib.estimate_contrib_slots(tree),
        )
        rays = generate_rays(W, H, FX, np.asarray(c2w)[None])
        o = rays.origins.reshape(-1, 3).astype(np.float32)
        d = rays.directions.reshape(-1, 3).astype(np.float32)
        mask = np.ones((o.shape[0], 1), np.float32)
        _, g_tab, _ = rend.loss_grad(
            rend.data0, o, d, jnp.asarray(gt.reshape(-1, 3)), jnp.asarray(mask)
        )
        leaves = tree._leaf_nodes()[np.asarray(opt.r.index["keep_mask"])]
        N = tree.N
        rows = (
            (leaves[:, 0] * N + leaves[:, 1]) * N + leaves[:, 2]
        ) * N + leaves[:, 3]
        g_march = np.asarray(g_tab)[rows]

        def cos(a, b):
            a, b = a.ravel().astype(np.float64), b.ravel().astype(np.float64)
            return float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))

        c_sigma = cos(g_tile[:, -1], g_march[:, -1])
        c_color = cos(g_tile[:, :-1], g_march[:, :-1])
        assert c_sigma > 0.98, f"sigma grad cosine {c_sigma:.4f}"
        assert c_color > 0.98, f"color grad cosine {c_color:.4f}"

    def test_write_back_round_trip(self, setup):
        tree, opt, leaf, c2w, gt = setup
        t2 = tree.clone()
        perturbed = np.asarray(leaf) + 1.0
        opt.write_back(t2, jnp.asarray(perturbed))
        opt2 = TileOptimizer(t2, step_size=1e-3, grid_c=8, rcap=128)
        np.testing.assert_allclose(
            np.asarray(opt2.initial_leaf_dataT()), perturbed, rtol=1e-6
        )
