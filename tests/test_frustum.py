"""FrustumRenderer vs the single-scan march oracle (renderer.render_rays)."""

import numpy as np
import pytest

from plenoctree_tpu.data.synthetic import render_synthetic_scene
from plenoctree_tpu.octree.frustum import FrustumRenderer, build_leaf_index
from plenoctree_tpu.octree.renderer import VolumeRenderer

from tests.test_octree import build_scene_tree


@pytest.fixture(scope="module")
def scene_tree():
    return build_scene_tree()


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


class TestLeafIndex:
    def test_replication_covers_all_leaves(self, scene_tree):
        idx = build_leaf_index(scene_tree, grid_c=16)
        # Every above-zero-sigma leaf appears at least once.
        leaves = scene_tree._leaf_nodes()
        data = scene_tree.data[
            leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]
        ]
        n_keep = int((data[:, -1] > 0).sum())
        assert idx["n_instances"] >= n_keep
        # CSR is consistent.
        start = np.asarray(idx["start"])
        count = np.asarray(idx["count"])
        assert int(count.sum()) == idx["n_instances"]
        assert (start[1:] == start[:-1] + count[:-1]).all() if start.size > 1 else True

    def test_home_cells_match_csr(self, scene_tree):
        idx = build_leaf_index(scene_tree, grid_c=16)
        soa = np.asarray(idx["soa"])
        home = soa[:, 6].view(np.int32)
        start = np.asarray(idx["start"])
        count = np.asarray(idx["count"])
        for cell in np.nonzero(count)[0][:50]:
            rows = home[start[cell] : start[cell] + count[cell]]
            assert (rows == cell).all()


class TestFrustumVsOracle:
    @pytest.mark.parametrize("grid_c", [16, 32])
    def test_matches_march_oracle(self, scene_tree, grid_c):
        # step 1e-4: the march oracle's svox-parity eps drift (t += eps per
        # segment) is small, so agreement should be tight. At 1e-3 the
        # oracle itself shifts content by ~2 leaf widths over a ray, so the
        # bar is looser — the frustum path computes exact intersections.
        images, c2ws, focal = render_synthetic_scene("test", 2, 48, True, 2.0, 6.0)
        for step, bar in ((1e-4, 40.0), (1e-3, 30.0)):
            vr = VolumeRenderer(scene_tree, step_size=step)
            fr = FrustumRenderer(scene_tree, step_size=step, grid_c=grid_c)
            for c2w in c2ws:
                ref = np.clip(vr.render_persp(c2w, 48, 48, focal), 0, 1)
                out = np.clip(fr.render_persp(c2w, 48, 48, focal), 0, 1)
                psnr = _psnr(out, ref)
                assert psnr > bar, f"step {step}: frustum vs oracle PSNR {psnr:.2f}"

    def test_fast_mode_thresholds(self, scene_tree):
        images, c2ws, focal = render_synthetic_scene("test", 1, 32, True, 2.0, 6.0)
        fr = FrustumRenderer(
            scene_tree, step_size=1e-3, sigma_thresh=1e-2, stop_thresh=1e-2
        )
        vr = VolumeRenderer(scene_tree, step_size=1e-3)
        ref = np.clip(vr.render_persp(c2ws[0], 32, 32, focal, fast=True), 0, 1)
        out = np.clip(fr.render_persp(c2ws[0], 32, 32, focal), 0, 1)
        assert _psnr(out, ref) > 35.0

    def test_non_tile_multiple_size(self, scene_tree):
        images, c2ws, focal = render_synthetic_scene("test", 1, 40, True, 2.0, 6.0)
        fr = FrustumRenderer(scene_tree, step_size=1e-4)
        out = fr.render_persp(c2ws[0], 40, 40, focal)
        assert out.shape == (40, 40, 3)
        vr = VolumeRenderer(scene_tree, step_size=1e-4)
        ref = np.clip(vr.render_persp(c2ws[0], 40, 40, focal), 0, 1)
        assert _psnr(np.clip(out, 0, 1), ref) > 40.0

    def test_empty_tree_renders_background(self):
        from plenoctree_tpu.octree import N3Tree

        tree = N3Tree(data_dim=4, depth_limit=2, radius=1.0, center=(0, 0, 0))
        fr = FrustumRenderer(tree)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0
        out = fr.render_persp(c2w, 16, 16, 16.0)
        assert np.allclose(out, 1.0)
