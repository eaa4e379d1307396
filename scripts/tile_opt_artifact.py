"""Commit-grade evidence for the differentiable tile optimizer (VERDICT r4 #4).

Produces docs/tile_opt_artifact.json with three sections, measured at the
verify-pipeline scale (or whatever --data_dir/--tree point at):

  1. grads: cosine similarity per field (sigma / SH colors) between the
     Pallas tile backward's d(loss)/d(leaf) and the march oracle's
     (octree/optimize.py TwoPhaseRenderer) on the same image — the claim
     previously living only in prose (STATUS.md round-3 #1).
  2. tile_opt: val PSNR trajectory + wall-clock for N epochs through
     optimize_tree_tiles.
  3. march_opt: same schedule through optimize_tree (reference-semantics
     peer, svox _VolumeRenderFunction, octree/optimization.py:174-231).

Usage:
  python scripts/tile_opt_artifact.py --data_dir /tmp/parity_full/data \
      --tree /tmp/parity_full/train/tree.npz --epochs 4 [--step_size 1e-4]
"""

import argparse
import json
import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def field_cosines(g_tile, g_march, basis_dim):
    """Per-field cosine between two [n_kept, D] leaf-gradient tables."""
    out = {}
    fields = {"sigma": g_tile[:, -1:], "color": g_tile[:, :-1]}
    fields_m = {"sigma": g_march[:, -1:], "color": g_march[:, :-1]}
    n_channels = (g_tile.shape[1] - 1) // basis_dim
    for c in range(n_channels):
        sl = slice(c * basis_dim, (c + 1) * basis_dim)
        fields[f"ch{c}"] = g_tile[:, sl]
        fields_m[f"ch{c}"] = g_march[:, sl]
    for name in fields:
        a = fields[name].ravel().astype(np.float64)
        b = fields_m[name].ravel().astype(np.float64)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        out[name] = {
            "cos": float(a @ b / max(na * nb, 1e-30)),
            "norm_tile": float(na),
            "norm_march": float(nb),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/parity_full/data")
    ap.add_argument("--tree", default="/tmp/parity_full/train/tree.npz")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--step_size", type=float, default=1e-4)
    ap.add_argument("--lr", type=float, default=1e7)
    ap.add_argument("--grid_c", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "tile_opt_artifact.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plenoctree_tpu.data import get_dataset
    from plenoctree_tpu.data.rays import generate_rays
    from plenoctree_tpu.octree import renderer as renderer_lib
    from plenoctree_tpu.octree import march as march_lib
    from plenoctree_tpu.octree.n3tree import N3Tree
    from plenoctree_tpu.octree.optimize import TwoPhaseRenderer, optimize_tree
    from plenoctree_tpu.octree.tile_opt import TileOptimizer, optimize_tree_tiles
    from plenoctree_tpu.utils.config import default_config

    cfg = default_config(
        dataset="blender", data_dir=args.data_dir, factor=0,
        renderer_step_size=args.step_size,
    )

    def get_data(stage):
        ds = get_dataset(stage, cfg, prefetch=False)
        return ds.focal, ds.camtoworlds, ds.images.reshape(-1, ds.h, ds.w, 3)

    focal, train_c2w, train_gt = get_data("train")
    _, test_c2w, test_gt = get_data("val")
    h, w = train_gt[0].shape[:2]
    tree = N3Tree.load(args.tree)
    print(f"tree: {tree.n_leaves} leaves depth={tree.max_depth}; "
          f"{len(train_c2w)} train / {len(test_c2w)} val images at {h}x{w}")
    result = {
        "tree": args.tree, "n_leaves": int(tree.n_leaves),
        "depth": int(tree.max_depth), "image": [int(h), int(w)],
        "epochs": args.epochs, "lr": args.lr, "step_size": args.step_size,
        "backend": jax.default_backend(),
    }

    # --- 1. gradient cross-check on train image 0 -------------------------
    topt = TileOptimizer(tree, step_size=args.step_size, grid_c=args.grid_c)
    leaf = topt.initial_leaf_dataT()
    gt0 = np.asarray(train_gt[0], np.float32)[..., :3]
    t0 = time.time()
    (tl, _aux), g_tileT = topt.loss_and_grad(leaf, train_c2w[0], gt0, h, w, focal)
    g_tile = np.asarray(g_tileT).T  # [n_kept, D]
    t_tile_grad = time.time() - t0
    print(f"tile grad: loss {float(tl):.6f} ({t_tile_grad:.1f}s incl. compile)")

    arrays = renderer_lib.tree_arrays(tree)
    opts = renderer_lib.RenderOptions(
        step_size=args.step_size,
        max_segments=renderer_lib.default_max_segments(tree),
    )
    fmt, basis_dim = tree.data_format.format, tree.data_format.basis_dim
    rend = TwoPhaseRenderer(
        arrays, fmt, basis_dim, opts,
        K=march_lib.estimate_contrib_slots(tree, opts.sigma_thresh),
    )
    rays = generate_rays(w, h, focal, np.asarray(train_c2w[0])[None])
    o = rays.origins.reshape(-1, 3).astype(np.float32)
    d = rays.directions.reshape(-1, 3).astype(np.float32)
    gt_flat = gt0.reshape(-1, 3)
    chunk = 16384
    g_march_tab = None
    t0 = time.time()
    for i in range(0, o.shape[0], chunk):
        sl = slice(i, min(i + chunk, o.shape[0]))
        n = sl.stop - sl.start
        pad = chunk - n
        om = np.pad(o[sl], ((0, pad), (0, 0)), mode="edge")
        dm = np.pad(d[sl], ((0, pad), (0, 0)), mode="edge")
        gm = np.pad(gt_flat[sl], ((0, pad), (0, 0)))
        mask = np.zeros((chunk, 1), np.float32)
        mask[:n] = 1.0
        _, g, _ = rend.loss_grad(rend.data0, om, dm, jnp.asarray(gm), jnp.asarray(mask))
        g_march_tab = np.asarray(g) if g_march_tab is None else g_march_tab + np.asarray(g)
    t_march_grad = time.time() - t0
    print(f"march grad: {t_march_grad:.1f}s")

    leaves = tree._leaf_nodes()[np.asarray(topt.r.index["keep_mask"])]
    N = tree.N
    rows = ((leaves[:, 0] * N + leaves[:, 1]) * N + leaves[:, 2]) * N + leaves[:, 3]
    g_march = g_march_tab[rows]
    # tile loss is mean MSE, march loss is sum of squares: cosine is
    # scale-free, norms are reported raw for the record.
    result["grads"] = field_cosines(g_tile, g_march, basis_dim)
    result["grads"]["seconds"] = {"tile": t_tile_grad, "march": t_march_grad}
    for k, v in result["grads"].items():
        print(" ", k, v)

    # --- 2/3. equal-schedule optimization, both paths ---------------------
    for name, fn in (
        ("tile_opt", lambda: optimize_tree_tiles(
            tree.clone(), train_c2w, train_gt, test_c2w, test_gt, focal, cfg,
            num_epochs=args.epochs, lr=args.lr, use_sgd=True,
            val_interval=1, continue_on_decrease=True, grid_c=args.grid_c,
        )),
        ("march_opt", lambda: optimize_tree(
            tree.clone(), train_c2w, train_gt, test_c2w, test_gt, focal, cfg,
            num_epochs=args.epochs, lr=args.lr, use_sgd=True,
            val_interval=1, continue_on_decrease=True,
        )),
    ):
        t0 = time.time()
        best_tree, best_psnr = fn()
        dt = time.time() - t0
        result[name] = {
            "best_val_psnr": float(best_psnr),
            "improved": best_tree is not None,
            "wall_s": dt,
        }
        print(f"{name}: best val {best_psnr:.2f} dB in {dt:.0f}s")

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
