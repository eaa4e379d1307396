"""One-process tile-renderer knob sweep on the bench scene.

Loads the bench tree + cached v6 index ONCE (the 661 MB tree npz costs
~220 s to load and the index build ~25 min — per-config bench invocations
would repay both), then measures pipelined serving wall-clock for a list
of (tile, runrows, nbuf) configs sharing that index. Also prints total
phase-1 pieces per frame for the first config (the kernel work unit).

Env: SW_CONFIGS="16:128:4,32:128:4,16:256:4,16:128:8,8:128:4" (tile:runrows:nbuf),
SW_RESO, SW_FRAMES.
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402


def load_index(quantum=128):
    import glob
    import json

    import jax.numpy as jnp

    hits = sorted(
        glob.glob(
            os.path.expanduser(
                f"~/.cache/plenoctree_bench/idx_v6_*_t0.01_c64_q{quantum}.npz"
            )
        )
    )
    if not hits:
        return None
    z = np.load(hits[-1])
    index = json.loads(str(z["meta_json"]))
    for k in ("soa", "csr", "base", "margin", "blk_bbox", "col_leaf", "keep_mask"):
        index[k] = z[k]
    for k in ("soa", "csr", "base", "margin", "blk_bbox"):
        index[k] = jnp.asarray(index[k])
    print(f"index: {hits[-1]} soa={index['soa'].shape}")
    return index


def main():
    import jax
    import jax.numpy as jnp

    from plenoctree_tpu.octree.n3tree import N3Tree
    from plenoctree_tpu.octree.tile_render import TileRenderer

    print("devices:", jax.devices())
    reso = int(os.environ.get("SW_RESO", 800))
    frames = int(os.environ.get("SW_FRAMES", 5))
    configs = [
        tuple(int(v) for v in c.split(":"))
        for c in os.environ.get(
            "SW_CONFIGS", "16:128:4,16:256:4,32:128:4,16:128:8,8:128:4"
        ).split(",")
    ]
    fx = reso * 1.1

    t0 = time.time()
    cache = "/tmp/bench_tree_d8.npz"
    tree = N3Tree.load(cache) if os.path.exists(cache) else make_tree(8)
    print(f"tree load: {time.time()-t0:.0f}s leaves={tree.n_leaves}")
    index = load_index()
    assert index is not None, "run bench_octree_render once to build the v6 cache"

    results = []
    for tile, runrows, nbuf in configs:
        rend = TileRenderer(
            tree, sigma_thresh=1e-2, stop_thresh=1e-2, grid_c=64,
            output="u8", tile=tile, runrows=runrows, nbuf=nbuf, index=index,
        )
        t0 = time.time()
        img = rend.render_persp(orbit_pose(0.123), reso, reso, fx)
        print(
            f"[t{tile} r{runrows} n{nbuf}] warmup {time.time()-t0:.0f}s "
            f"mean={img.mean():.2f} ccap={rend.ccap} w1cap={rend.w1cap}"
        )
        # piece stats (kernel work unit): one tile_inputs eval
        ti = rend.make_tile_inputs_fn(reso, reso, fx, rend.rcap, rend.w1cap)
        p2_args, _, npc, _ = jax.jit(ti)(
            jnp.asarray(orbit_pose(0.8).astype(np.float32)),
            index["csr"], index["base"], rend.extra_data, index["blk_bbox"],
        )
        total_pieces = int(np.asarray(p2_args[0][:, 0, 0]).sum())
        print(f"  pieces/frame (post-drop) = {total_pieces}")

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
            img, n_max, nc_max, w1_over = rend._fetch(pending, reso, reso)
            rend._check_caps(n_max, nc_max, w1_over)
            t1 = time.time()
            times.append(t1 - t0)
            t0 = t1
            pending = nxt
        med = sorted(times)[len(times) // 2]
        best = min(times)
        print(
            f"  RESULT t{tile} r{runrows} n{nbuf}: median {med*1000:.0f} ms "
            f"({1/med:.2f} FPS) best {best*1000:.0f} ms ({1/best:.2f} FPS) "
            f"frames={[int(x*1000) for x in times]}"
        )
        results.append((tile, runrows, nbuf, med, best))
    print("\nSWEEP SUMMARY")
    for tile, runrows, nbuf, med, best in sorted(results, key=lambda r: r[3]):
        print(
            f"  t{tile} r{runrows} n{nbuf}: median {med*1000:.0f} ms, "
            f"best {best*1000:.0f} ms"
        )


if __name__ == "__main__":
    main()
