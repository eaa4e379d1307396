"""On-chip validation of the Pallas tile renderer vs the march oracle.

Runs on the real TPU (no conftest CPU forcing): builds the analytic test
scene tree at a moderate depth, renders a few poses through both the exact
march oracle and the tile renderer (scanning quantum/runrows), and asserts
PSNR between them. This is the post-relay-recovery gate from CLAUDE.md —
the round-3 kernel restructure was only ever verified in interpret mode /
AOT lowering, so this is the first Mosaic-on-hardware execution.

Also validates the differentiable tile_opt forward+backward on chip
(value_and_grad finiteness + forward-vs-serving-renderer agreement).
"""

import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

import numpy as np


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import jax

    print("devices:", jax.devices())

    from plenoctree_tpu.data.synthetic import render_synthetic_scene
    from plenoctree_tpu.octree.renderer import VolumeRenderer
    from plenoctree_tpu.octree.tile_render import TileRenderer
    from tests.test_octree import build_scene_tree

    depth = int(os.environ.get("VT_DEPTH", 5))
    reso = int(os.environ.get("VT_RESO", 64))
    tree = build_scene_tree(depth=depth)
    print(f"tree: depth={tree.max_depth} leaves={tree.n_leaves}")
    _, c2ws, focal = render_synthetic_scene("test", 3, reso, True, 2.0, 6.0)

    vr = VolumeRenderer(tree, step_size=1e-4)
    refs = [
        np.clip(vr.render_persp(c2w, reso, reso, focal), 0, 1) for c2w in c2ws
    ]
    print("march oracle rendered")

    ok = True
    # Hardware requires quantum=128 (Mosaic 128-aligned lane slices); scan
    # runrows + tile size, the two knobs that are legal on chip.
    for tile_sz in (16, 32):
        for runrows in (128, 256):
            t0 = time.time()
            tr = TileRenderer(
                tree,
                step_size=1e-4,
                grid_c=16,
                tile=tile_sz,
                runrows=runrows,
            )
            worst = 99.0
            for c2w, ref in zip(c2ws, refs):
                out = np.clip(tr.render_persp(c2w, reso, reso, focal), 0, 1)
                worst = min(worst, _psnr(out, ref))
            status = "OK " if worst > 45.0 else "FAIL"
            if worst <= 45.0:
                ok = False
            print(
                f"{status} tile={tile_sz} rr={runrows}: worst PSNR vs oracle "
                f"{worst:.2f} dB ({time.time()-t0:.1f}s)"
            )

    # tile_opt: differentiable forward must match the oracle; grads finite
    # and nonzero on chip (first Mosaic-on-hardware run of the backward).
    from plenoctree_tpu.octree.tile_opt import TileOptimizer

    topt = TileOptimizer(tree, step_size=1e-4, grid_c=16)
    dataT = topt.initial_leaf_dataT()
    c2w = c2ws[0]
    img, n_max, nc_max, w1_over = topt.render(dataT, c2w, reso, reso, focal)
    p = _psnr(np.clip(np.asarray(img), 0, 1), refs[0])
    print(f"tile_opt forward vs oracle: {p:.2f} dB")
    if p <= 40.0:
        ok = False

    gt = refs[0]
    (loss, _aux), grad = topt.loss_and_grad(dataT, c2w, gt, reso, reso, focal)
    gn = float(np.linalg.norm(np.asarray(grad, np.float32)))
    print(f"tile_opt value_and_grad: loss={float(loss):.6f} |g|={gn:.4f}")
    if not (np.isfinite(float(loss)) and np.isfinite(gn) and gn > 0):
        ok = False

    print("VALIDATION", "PASSED" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
