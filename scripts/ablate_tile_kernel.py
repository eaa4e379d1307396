"""On-chip tile-kernel cost attribution via timing-only ablations.

Loads the bench tree + cached v6 index once, then times pipelined frames
for each (tile, runrows) config under each kernel ablation
(tile_render._tile_kernel `ablate`):

  ""        : production kernel (per-group saturation skip ON)
  noskip    : disable the per-group saturation skip (A/B its win)
  allon     : force all quad-group masks on — the NDC/LLFF serving cost
              model (image CORRECT, masks are conservative)
  nobefore  : skip the [R, R] precedence construction  (WRONG image)
  noslab    : skip the per-axis slab tests              (WRONG image)
  nodecode  : skip the per-channel SH decode + composite(WRONG image)

The deltas attribute per-chunk kernel time to each stage — the round-4
decision gate (docs/STATUS.md) for choosing the next serving lever.

Env: AB_CONFIGS="16:128,32:256" AB_ABLATIONS="",noskip,nobefore,...
     AB_FRAMES=5 AB_RESO=800
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402
from sweep_tile_knobs import load_index  # noqa: E402


def main():
    import jax

    from plenoctree_tpu.octree.n3tree import N3Tree
    from plenoctree_tpu.octree.tile_render import TileRenderer

    print("devices:", jax.devices())
    reso = int(os.environ.get("AB_RESO", 800))
    frames = int(os.environ.get("AB_FRAMES", 5))
    configs = [
        tuple(int(v) for v in c.split(":"))
        for c in os.environ.get("AB_CONFIGS", "16:128").split(",")
    ]
    ablations = os.environ.get(
        "AB_ABLATIONS", ",noskip,nobefore,noslab,nodecode"
    ).split(",")
    fx = reso * 1.1

    t0 = time.time()
    cache = "/tmp/bench_tree_d8.npz"
    tree = N3Tree.load(cache) if os.path.exists(cache) else make_tree(8)
    print(f"tree load: {time.time()-t0:.0f}s leaves={tree.n_leaves}")
    index = load_index()
    assert index is not None, "run bench_octree_render once to build the v6 cache"

    rows = []
    for tile, runrows in configs:
        for ab in ablations:
            rend = TileRenderer(
                tree, sigma_thresh=1e-2, stop_thresh=1e-2, grid_c=64,
                output="u8", tile=tile, runrows=runrows, nbuf=4,
                index=index, ablate=ab,
            )
            t0 = time.time()
            img = rend.render_persp(orbit_pose(0.123), reso, reso, fx)
            print(
                f"[t{tile} r{runrows} ab={ab or 'none'}] warmup "
                f"{time.time()-t0:.0f}s mean={img.mean():.2f}",
                flush=True,
            )
            poses = [orbit_pose(0.4 + 0.31 * i) for i in range(frames)]
            times = []
            t0 = time.time()
            pending = rend.render_persp_async(poses[0], reso, reso, fx)
            for i in range(frames):
                nxt = (
                    rend.render_persp_async(poses[i + 1], reso, reso, fx)
                    if i + 1 < frames
                    else None
                )
                rend._fetch(pending, reso, reso)
                t1 = time.time()
                times.append(t1 - t0)
                t0 = t1
                pending = nxt
            med = sorted(times)[len(times) // 2]
            print(
                f"  t{tile} r{runrows} ab={ab or 'none'}: median "
                f"{med*1000:.0f} ms best {min(times)*1000:.0f} ms "
                f"frames={[int(x*1000) for x in times]}",
                flush=True,
            )
            rows.append((tile, runrows, ab or "none", med, min(times)))

    print("\nABLATION SUMMARY (median ms; delta vs production = stage cost)")
    base = {}
    for tile, runrows, ab, med, best in rows:
        if ab == "none":
            base[(tile, runrows)] = med
    for tile, runrows, ab, med, best in rows:
        d = base.get((tile, runrows))
        delta = f" delta={1000*(d-med):+.0f} ms" if d and ab != "none" else ""
        print(
            f"  t{tile} r{runrows} {ab:9s}: median {med*1000:.0f} ms "
            f"best {best*1000:.0f} ms{delta}"
        )


if __name__ == "__main__":
    main()
