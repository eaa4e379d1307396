"""TileRenderer (Pallas, interpret mode on CPU) vs the march oracle."""

import numpy as np
import pytest

from plenoctree_tpu.data.synthetic import render_synthetic_scene
from plenoctree_tpu.octree.tile_render import TileRenderer, build_tile_index
from plenoctree_tpu.octree.renderer import VolumeRenderer

from tests.test_octree import build_scene_tree


@pytest.fixture(scope="module")
def scene_tree():
    return build_scene_tree()


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


class TestTileIndex:
    def test_replicas_cover_all_overlapped_cells(self, scene_tree):
        """Each kept leaf has one replica per coarse cell its box overlaps."""
        C = 16
        idx = build_tile_index(scene_tree, grid_c=C)
        leaves = scene_tree._leaf_nodes()
        data = scene_tree.data[
            leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]
        ]
        keep = data[:, -1] > 0
        corner = scene_tree._cell_corner(leaves)[keep].astype(np.float64)
        size = scene_tree._cell_size(leaves)[keep].astype(np.float64)
        lo_cell = np.clip((corner * C).astype(int), 0, C - 1)
        hi_cell = np.clip(np.ceil((corner + size[:, None]) * C).astype(int) - 1, 0, C - 1)
        expect = int((hi_cell - lo_cell + 1).prod(axis=1).sum())
        assert idx["n_instances"] == expect

    def test_csr_consistent_per_axis(self, scene_tree):
        idx = build_tile_index(scene_tree, grid_c=16)
        csr = np.asarray(idx["csr"])
        for axis in range(3):
            assert csr[axis, 0] == 0
            assert csr[axis, -1] == idx["n_instances"]
            assert (np.diff(csr[axis]) >= 0).all()

    def test_clipped_boxes_partition_leaves(self, scene_tree):
        """Replica boxes are clipped to cells (exact spatial partition):
        each row's box fits one coarse cell, and the replicas of all leaves
        sum to the total kept leaf volume (no overlap, no gap)."""
        C = 16
        idx = build_tile_index(scene_tree, grid_c=C)
        n = idx["n_instances"]
        # Blocked soa [blocks, fields, quantum] -> flat field-major view.
        soa3 = np.asarray(idx["soa"])
        soa = soa3.transpose(1, 0, 2).reshape(soa3.shape[1], -1)
        lo = soa[0:3, :n].T.astype(np.float64)
        hi = soa[3:6, :n].T.astype(np.float64)
        assert (hi > lo).all()
        # Each clipped box stays inside a single coarse cell.
        cell = np.floor(lo * C)
        assert (hi * C <= cell + 1 + 1e-6).all()
        # Volume partition: sum of replica volumes == sum of kept leaf volumes.
        leaves = scene_tree._leaf_nodes()
        data = scene_tree.data[
            leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]
        ]
        keep = data[:, -1] > 0
        size = scene_tree._cell_size(leaves)[keep].astype(np.float64)
        np.testing.assert_allclose(
            (hi - lo).prod(axis=1).sum(), (size**3).sum(), rtol=1e-6
        )
        # Fine-l2 CSR buckets hold rows whose centers fall in the bucket.
        c2 = idx["fine_c2"]
        csr = np.asarray(idx["csr"])[0]
        cell_of_row = np.searchsorted(csr, np.arange(n), side="right") - 1
        ctr = 0.5 * (lo + hi)
        key = (
            np.clip((ctr[:, 0] * C).astype(int), 0, C - 1) * C
            + np.clip((ctr[:, 1] * C).astype(int), 0, C - 1)
        ) * c2 + np.clip((ctr[:, 2] * c2).astype(int), 0, c2 - 1)
        assert (key == cell_of_row).all()


class TestMergeRuns:
    """_merge_runs: window-overlap fusion must cover every original row,
    stay direction-consistent, and never fetch extra DMA windows."""

    def _windows(self, s, l, runrows):
        w = set()
        for a, b in zip(s, l):
            if b <= 0:
                continue
            for c in range(
                (a // runrows) * runrows,
                ((a + b - 1) // runrows) * runrows + 1,
                runrows,
            ):
                w.add(c)
        return w

    @pytest.mark.parametrize("rev", [0, 1])
    @pytest.mark.parametrize("holes", [False, True])
    def test_random_runs(self, rev, holes):
        import jax.numpy as jnp
        from plenoctree_tpu.octree.tile_render import _merge_runs

        rng = np.random.default_rng(11 + rev + 2 * holes)
        runrows, rcap = 128, 64
        for _ in range(25):
            n = int(rng.integers(0, 20))
            # Disjoint sorted intervals, travel-ordered by rev.
            starts = np.sort(rng.choice(20000, size=n, replace=False))
            lens = rng.integers(1, 300, size=n)
            ends = starts + lens
            keep = np.ones(n, bool)
            for i in range(1, n):
                if starts[i] < ends[: i][keep[:i]].max(initial=-1):
                    keep[i] = False
            starts, lens = starts[keep], lens[keep]
            n = starts.shape[0]
            if rev:
                starts, lens = starts[::-1].copy(), lens[::-1].copy()
            s = np.zeros(rcap, np.int32)
            l = np.zeros(rcap, np.int32)
            m = np.zeros(rcap, np.int32)
            if holes and n:
                # Flat-lattice semantics: invalid (len 0) slots may appear
                # anywhere; chains must bridge them.
                pos = np.sort(rng.choice(rcap, size=n, replace=False))
            else:
                pos = np.arange(n)
            s[pos], l[pos] = starts, lens
            m[pos] = rng.integers(1, 16, size=n)
            ms, ml, mm, mn = _merge_runs(
                jnp.asarray(s), jnp.asarray(l), jnp.asarray(m),
                jnp.int32(rev), runrows,
            )
            ms, ml, mm, mn = np.asarray(ms), np.asarray(ml), np.asarray(mm), int(mn)
            assert mn <= n
            # Every original row is inside some merged run.
            orig = set()
            for a, b in zip(starts, lens):
                orig.update(range(a, a + b))
            merged = set()
            for a, b in zip(ms[:mn], ml[:mn]):
                merged.update(range(a, a + b))
            assert orig <= merged
            # No extra DMA windows are introduced.
            assert self._windows(ms[:mn], ml[:mn], runrows) <= self._windows(
                starts, lens, runrows
            )
            # Merged runs stay in travel order (disjoint, monotone).
            me = ms[:mn] + ml[:mn]
            for i in range(1, mn):
                if rev:
                    assert me[i] <= ms[i - 1]
                else:
                    assert ms[i] >= me[i - 1]
            # Group masks: unions preserved, no merged run loses all bits.
            if mn:
                assert (mm[:mn] > 0).all()
                assert np.bitwise_or.reduce(mm[:mn]) == np.bitwise_or.reduce(
                    m[pos]
                )


class TestTileVsOracle:
    @pytest.mark.parametrize("grid_c", [16, 32])
    def test_matches_march_oracle(self, scene_tree, grid_c):
        images, c2ws, focal = render_synthetic_scene("test", 2, 48, True, 2.0, 6.0)
        vr = VolumeRenderer(scene_tree, step_size=1e-4)
        tr = TileRenderer(scene_tree, step_size=1e-4, grid_c=grid_c)
        for c2w in c2ws:
            ref = np.clip(vr.render_persp(c2w, 48, 48, focal), 0, 1)
            out = np.clip(tr.render_persp(c2w, 48, 48, focal), 0, 1)
            psnr = _psnr(out, ref)
            assert psnr > 45.0, f"grid_c {grid_c}: tile vs oracle PSNR {psnr:.2f}"

    def test_fast_mode_thresholds(self, scene_tree):
        # step 1e-4: the march oracle's svox-parity eps drift (t += eps per
        # segment) stays small; at 1e-3 the oracle itself displaces content
        # (the tile path computes exact segment entries).
        images, c2ws, focal = render_synthetic_scene("test", 1, 32, True, 2.0, 6.0)
        tr = TileRenderer(
            scene_tree, step_size=1e-4, sigma_thresh=1e-2, stop_thresh=1e-2
        )
        vr = VolumeRenderer(scene_tree, step_size=1e-4)
        ref = np.clip(vr.render_persp(c2ws[0], 32, 32, focal, fast=True), 0, 1)
        out = np.clip(tr.render_persp(c2ws[0], 32, 32, focal), 0, 1)
        assert _psnr(out, ref) > 35.0

    def test_non_tile_multiple_size(self, scene_tree):
        images, c2ws, focal = render_synthetic_scene("test", 1, 40, True, 2.0, 6.0)
        tr = TileRenderer(scene_tree, step_size=1e-4)
        out = tr.render_persp(c2ws[0], 40, 40, focal)
        assert out.shape == (40, 40, 3)
        vr = VolumeRenderer(scene_tree, step_size=1e-4)
        ref = np.clip(vr.render_persp(c2ws[0], 40, 40, focal), 0, 1)
        assert _psnr(np.clip(out, 0, 1), ref) > 45.0

    def test_ndc_matches_march(self, scene_tree):
        """LLFF serving path (VERDICT r3 #5): NDC rays through the tile
        renderer agree with the march oracle's NDC mode (reference:
        octree/optimization.py:170-173 NDCConfig through svox)."""
        from plenoctree_tpu.octree.renderer import make_ndc_config

        w = h = 32
        focal = 40.0
        ndc = make_ndc_config(w, h, focal)
        # Near-forward-facing cameras (the LLFF regime): identity plus a
        # small off-axis tilt/offset.
        c2ws = []
        for dx, ang in ((0.0, 0.0), (0.15, 0.06)):
            c2w = np.eye(4, dtype=np.float32)
            c, s = np.cos(ang), np.sin(ang)
            c2w[:3, :3] = np.array(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32
            )
            c2w[0, 3] = dx
            c2ws.append(c2w)
        vr = VolumeRenderer(scene_tree, step_size=1e-4, ndc=ndc)
        tr = TileRenderer(scene_tree, step_size=1e-4, grid_c=16, ndc=ndc)
        for c2w in c2ws:
            ref = np.clip(vr.render_persp(c2w, h, w, focal), 0, 1)
            out = np.clip(tr.render_persp(c2w, h, w, focal), 0, 1)
            psnr = _psnr(out, ref)
            assert psnr > 40.0, f"NDC tile vs march oracle PSNR {psnr:.2f}"

    def test_tile32_and_u8_output(self, scene_tree):
        images, c2ws, focal = render_synthetic_scene("test", 1, 64, True, 2.0, 6.0)
        vr = VolumeRenderer(scene_tree, step_size=1e-4)
        ref = np.clip(vr.render_persp(c2ws[0], 64, 64, focal), 0, 1)
        tr = TileRenderer(
            scene_tree, step_size=1e-4, grid_c=16, tile=32, output="u8"
        )
        out = tr.render_persp(c2ws[0], 64, 64, focal)
        assert out.dtype == np.uint8 and out.shape == (64, 64, 3)
        psnr = _psnr(out.astype(np.float32) / 255.0, ref)
        assert psnr > 45.0, f"tile=32/u8 vs oracle PSNR {psnr:.2f}"

    def test_quad_mask_is_conservative(self, scene_tree):
        # Group masks may only skip provably-no-hit work: running the
        # kernel with every mask bit forced ON must reproduce the masked
        # render bitwise.
        import jax.numpy as jnp

        tr = TileRenderer(scene_tree, step_size=1e-3, grid_c=8,
                          use_bf16=False)
        images, c2ws, focal = render_synthetic_scene(
            "test", 1, 32, True, 2.0, 6.0
        )
        h = w = 32
        tr.w1cap = tr.w1cap or 8
        ti = tr.make_tile_inputs_fn(h, w, float(focal), tr.rcap, 8, tr.ccap)
        idx = tr.index
        p2_args, _, _, _ = ti(
            jnp.asarray(np.asarray(c2ws[0], np.float32)),
            idx["csr"], idx["base"], tr.extra_data, idx["blk_bbox"],
        )
        n_tiles = p2_args[0].shape[0]
        p2 = tr._get_p2(n_tiles, tr.ccap)
        out_masked = np.asarray(p2(*p2_args, idx["soa"]))
        full = list(p2_args)
        full[4] = jnp.full_like(p2_args[4], 15)
        out_full = np.asarray(p2(*full, idx["soa"]))
        np.testing.assert_array_equal(out_masked, out_full)

    def test_ndc_quad_mask_is_conservative(self, scene_tree):
        # NDC group masks (segment-endpoint AABB planes — rays share no
        # apex) may only skip provably-no-hit work: all-bits-on must
        # reproduce the masked render bitwise. Also asserts the masks are
        # non-vacuous (some bits actually cleared) so a regression to
        # all-on would fail loudly.
        import jax.numpy as jnp

        from plenoctree_tpu.octree.renderer import make_ndc_config

        h = w = 32
        focal = 40.0
        ndc = make_ndc_config(w, h, focal)
        tr = TileRenderer(scene_tree, step_size=1e-3, grid_c=8,
                          use_bf16=False, ndc=ndc)
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.1
        tr.w1cap = tr.w1cap or 8
        ti = tr.make_tile_inputs_fn(h, w, float(focal), tr.rcap, 8, tr.ccap)
        idx = tr.index
        p2_args, _, _, _ = ti(
            jnp.asarray(c2w),
            idx["csr"], idx["base"], tr.extra_data, idx["blk_bbox"],
        )
        meta, masks = np.asarray(p2_args[0]), np.asarray(p2_args[4])
        nck = meta[:, 0, 0]
        valid = np.zeros_like(masks, bool)
        for t in range(masks.shape[0]):
            valid[t, 0, : nck[t]] = True
        assert (masks[valid] > 0).all()  # zero-mask pieces were compacted
        assert (masks[valid] < 15).any(), "NDC masks are vacuously all-on"
        n_tiles = p2_args[0].shape[0]
        p2 = tr._get_p2(n_tiles, tr.ccap)
        out_masked = np.asarray(p2(*p2_args, idx["soa"]))
        full = list(p2_args)
        full[4] = jnp.full_like(p2_args[4], 15)
        out_full = np.asarray(p2(*full, idx["soa"]))
        np.testing.assert_array_equal(out_masked, out_full)

    def test_sharded_mesh_matches_single_device(self, scene_tree):
        # Multi-chip serving: tile axis sharded over an 8-device mesh via
        # shard_map must reproduce the single-device render bitwise.
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("data",))
        single = TileRenderer(scene_tree, step_size=1e-3, grid_c=8,
                              use_bf16=False)
        sharded = TileRenderer(scene_tree, step_size=1e-3, grid_c=8,
                               use_bf16=False, mesh=mesh)
        images, c2ws, focal = render_synthetic_scene(
            "test", 1, 40, True, 2.0, 6.0
        )
        # 40x40 -> 9 tiles: exercises padding to the 8-device multiple.
        a = single.render_persp(c2ws[0], 40, 40, focal)
        b = sharded.render_persp(c2ws[0], 40, 40, focal)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_empty_tree_renders_background(self):
        from plenoctree_tpu.octree import N3Tree

        tree = N3Tree(data_dim=4, depth_limit=2, radius=1.0, center=(0, 0, 0))
        tr = TileRenderer(tree)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0
        out = tr.render_persp(c2w, 16, 16, 16.0)
        assert np.allclose(out, 1.0)
