"""Upfront march contributor-slot sizing at its motivating scale.

VERDICT r4 #7: `estimate_contrib_slots` (march.py) exists because sticky
K-regrowth cost one full re-march per doubling on dense volumetric trees
(and the pre-estimator behavior — K=2048 everywhere — OOMed the chip on
the optimizer). Nothing previously exercised it on a tree dense enough to
matter. These tests build a fully-dense fog cube (every voxel occupied,
the worst case for slot count) and pin the estimator against the settled
K that sticky regrowth actually converges to.

Reference capability anchored: svox's CUDA renderer has no slot concept
(it composites in-flight), so slot sizing is an artifact of the TPU
two-phase design — the contract is purely internal: estimator within one
doubling of settled K, and saturation-aware (an optically thick tree must
NOT be sized by raw occupancy).
"""

import numpy as np
import pytest

from plenoctree_tpu.octree import N3Tree
from plenoctree_tpu.octree.march import DeferredRenderer, estimate_contrib_slots
from plenoctree_tpu.octree.renderer import RenderOptions, split_arrays, tree_arrays


DEPTH = 5  # finest grid 2^(5+1) = 64 per axis; 262,144 leaves (dense)


def build_dense_fog_tree(sigma_val):
    """Fully refined tree with uniform sigma: every column holds 64 cells."""
    tree = N3Tree(
        data_dim=4,
        depth_limit=DEPTH,
        radius=1.2,
        center=(0.0, 0.0, 0.0),
        data_format="SH1",
        init_reserve=40000,
    )
    reso = 2 ** (DEPTH + 1)
    arr = (np.arange(reso) + 0.5) / reso
    grid_t = np.stack(
        np.meshgrid(arr, arr, arr, indexing="ij"), -1
    ).reshape(-1, 3)
    pts = tree.tree2world(grid_t)
    for _ in range(DEPTH):
        tree.refine_points(pts)
    assert tree.max_depth == DEPTH
    leaf_ind = np.nonzero(tree.depths == DEPTH)[0]
    assert leaf_ind.size == reso**3, "tree is not fully dense"
    data = np.full((leaf_ind.size, 4), 0.5, np.float32)
    data[:, -1] = sigma_val
    tree.set_leaf_data(leaf_ind, data)
    return tree


def settled_k(tree, start_k=64):
    """Render axis + diagonal rays starting at K=start_k; return the K that
    sticky regrowth settles on (DeferredRenderer mutates self.K)."""
    arrays = tree_arrays(tree)
    opts = RenderOptions(step_size=1e-4)
    rend = DeferredRenderer(
        arrays, tree.data_format.format, tree.data_format.basis_dim, opts,
        K=start_k,
    )
    # Worst-case bundle: axis-aligned center rays (64 cells) plus the four
    # main diagonals (~3*64 cells) plus a random frustum-ish spread.
    rng = np.random.default_rng(0)
    o_axis = np.array(
        [[-2.0, 0.01, 0.01], [0.01, -2.0, 0.01], [0.01, 0.01, -2.0]],
        np.float32,
    )
    d_axis = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    corners = np.array(
        [[-1, -1, -1], [-1, -1, 1], [-1, 1, -1], [-1, 1, 1]], np.float32
    ) * 1.3
    d_diag = -corners / np.linalg.norm(corners, axis=-1, keepdims=True)
    o_rand = rng.normal(size=(57, 3)).astype(np.float32)
    o_rand = 2.0 * o_rand / np.linalg.norm(o_rand, axis=-1, keepdims=True)
    d_rand = -o_rand / np.linalg.norm(o_rand, axis=-1, keepdims=True)
    origins = np.concatenate([o_axis, corners, o_rand], 0)
    dirs = np.concatenate([d_axis, d_diag, d_rand], 0)
    rend.render_chunk(origins, dirs)
    return rend.K


class TestEstimatorAtScale:
    def test_dense_unsaturating_within_one_doubling(self):
        # sigma=1.0: column optical depth 64 * 0.0375 = 2.4 << -log(1e-4),
        # so nothing saturates and K is set by geometry alone. This is the
        # regime where pre-estimator code paid 5 re-march doublings.
        tree = build_dense_fog_tree(sigma_val=1.0)
        est = estimate_contrib_slots(tree)
        settled = settled_k(tree)
        assert settled > 64, "scene failed to exercise regrowth at all"
        assert settled // 2 <= est <= settled * 2, (
            f"estimator K={est} not within one doubling of settled K={settled}"
        )

    def test_dense_saturating_stays_small(self):
        # sigma=80: per-cell optical depth 80 * 0.0375 = 3.0, rays saturate
        # (light < 1e-4) after ~4 cells. The motivating failure: occupancy
        # counting says 64-192 slots (-> K 2048 on real extracted trees,
        # OOM); the saturation-aware estimate must stay at the floor.
        tree = build_dense_fog_tree(sigma_val=80.0)
        est = estimate_contrib_slots(tree)
        assert est == 64, f"saturating dense tree sized K={est}, expected floor"
        settled = settled_k(tree)
        assert settled == 64, f"regrowth fired (K={settled}) on a saturating tree"

    def test_descending_asymmetric_column(self):
        # ADVICE r4: a column thick at the low end, thin at the high end.
        # Entered from the thin end the ray saturates LATE and needs ~all
        # slots; the ascending-only prefix undercounted this direction.
        tree = N3Tree(
            data_dim=4,
            depth_limit=DEPTH,
            radius=1.2,
            center=(0.0, 0.0, 0.0),
            data_format="SH1",
            init_reserve=40000,
        )
        reso = 2 ** (DEPTH + 1)
        arr = (np.arange(reso) + 0.5) / reso
        # One dense column of cells along +x at the cube center.
        col_t = np.stack(
            [arr, np.full(reso, 0.509), np.full(reso, 0.509)], -1
        )
        pts = tree.tree2world(col_t)
        for _ in range(DEPTH):
            tree.refine_points(pts)
        leaf_ind = np.nonzero(tree.depths == DEPTH)[0]
        centers = tree.leaf_centers()[leaf_ind]
        on_col = (np.abs(centers[:, 1] - 0.509) < 0.5 / reso) & (
            np.abs(centers[:, 2] - 0.509) < 0.5 / reso
        )
        col_leaves = leaf_ind[on_col]
        order = np.argsort(centers[on_col, 0])
        col_leaves = col_leaves[order]
        assert col_leaves.size == reso
        # First 4 cells optically thick (saturate an ascending entry), rest
        # thin: ascending-order count ~5; descending count ~reso.
        sigma = np.full(reso, 0.5, np.float32)
        sigma[:4] = 100.0
        data = np.full((reso, 4), 0.5, np.float32)
        data[:, -1] = sigma
        tree.set_leaf_data(col_leaves, data)
        est = estimate_contrib_slots(tree)
        # Descending traversal passes ~60 thin cells before hitting the
        # thick wall: the bidirectional estimate must cover them.
        assert est >= 64 and est <= 256
        # And it must indeed avoid regrowth for a -x ray entering thin-first.
        arrays = tree_arrays(tree)
        opts = RenderOptions(step_size=1e-4)
        rend = DeferredRenderer(
            arrays, tree.data_format.format, tree.data_format.basis_dim,
            opts, K=est,
        )
        o = np.array([[2.0, 0.019, 0.019]], np.float32)
        d = np.array([[-1.0, 0.0, 0.0]], np.float32)
        rend.render_chunk(o, d)
        assert rend.K == est, "regrowth fired despite upfront estimate"
