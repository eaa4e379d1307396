"""Native C++ runtime: build equivalence, query parity, median cut parity.

All tests skip gracefully when the toolchain is unavailable (the numpy
fallbacks are covered by the other suites with PLENOCTREE_NO_NATIVE)."""

import numpy as np
import pytest

from plenoctree_tpu import native
from plenoctree_tpu.octree import N3Tree

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


class TestBuildOctree:
    def test_matches_refine_loop(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32)
        t1 = N3Tree(data_dim=4, depth_limit=4, radius=1.0, center=(0, 0, 0))
        t1.build_from_points(pts)
        t2 = N3Tree(data_dim=4, depth_limit=4, radius=1.0, center=(0, 0, 0))
        for _ in range(4):
            t2.refine_points(pts)
        assert t1.n_internal == t2.n_internal
        assert t1.n_leaves == t2.n_leaves
        assert t1.max_depth == t2.max_depth == 4
        # Same containment: every input point lands at the same depth.
        d1 = t1.query_points(pts)[2]
        d2 = t2.query_points(pts)[2]
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_single_point(self):
        t = N3Tree(data_dim=4, depth_limit=3, radius=1.0, center=(0, 0, 0))
        t.build_from_points(np.array([[0.5, 0.5, 0.5]], np.float32))
        assert t.max_depth == 3
        assert t.n_internal == 4

    def test_parent_pointers_consistent(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32)
        t = N3Tree(data_dim=4, depth_limit=3, radius=1.0, center=(0, 0, 0))
        t.build_from_points(pts)
        n = t.n_internal
        for i in range(1, n):
            packed, depth = t.parent_depth[i]
            parent = packed // 8
            cell = packed % 8
            ci, cj, ck = cell // 4, (cell // 2) % 2, cell % 2
            assert t.child[parent, ci, cj, ck] == i - parent
            assert t.parent_depth[parent, 1] == depth - 1


class TestQueryNative:
    def test_matches_numpy_descent(self):
        import os

        rng = np.random.default_rng(2)
        pts = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
        t = N3Tree(data_dim=4, depth_limit=4, radius=1.0, center=(0, 0, 0))
        t.build_from_points(pts[:500])
        q = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
        node_n, cell_n, depth_n = t.query_points(q)
        os.environ["PLENOCTREE_NO_NATIVE"] = "1"
        try:
            # Force the numpy descent by bypassing the native import path.
            tq = np.clip(t.world2tree(q), 0, 1 - 1e-6).astype(np.float64)
            node = np.zeros(tq.shape[0], dtype=np.int64)
            pos = tq.copy()
            for _ in range(t.depth_limit + 1):
                idx = np.minimum((pos * 2).astype(np.int64), 1)
                rel = t.child[node, idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int64)
                live = rel != 0
                node = np.where(live, node + rel, node)
                pos = np.where(live[:, None], pos * 2 - idx, pos)
            idx = np.minimum((pos * 2).astype(np.int64), 1)
        finally:
            del os.environ["PLENOCTREE_NO_NATIVE"]
        np.testing.assert_array_equal(np.asarray(node_n), node)
        np.testing.assert_array_equal(np.asarray(cell_n), idx)


class TestMedianCutNative:
    def test_matches_numpy_error(self):
        rng = np.random.default_rng(3)
        cols = rng.random((20000, 3)).astype(np.float32)
        pal_n, ids_n = native.median_cut_native(cols, bits=6)
        err_n = np.abs(pal_n[ids_n] - cols).mean()
        import importlib

        from plenoctree_tpu.octree import quantize

        # numpy reference path
        import os

        os.environ["PLENOCTREE_NO_NATIVE"] = "1"
        native._LIB = None
        native._TRIED = False
        try:
            importlib.reload(native)
            pal_p, ids_p = quantize.quantize_median_cut(cols, bits=6)
        finally:
            del os.environ["PLENOCTREE_NO_NATIVE"]
            native._LIB = None
            native._TRIED = False
        err_p = np.abs(pal_p[ids_p] - cols).mean()
        assert abs(err_n - err_p) < 0.005
        assert pal_n.shape[0] <= 64
