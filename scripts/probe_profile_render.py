"""Capture a jax.profiler trace of one render_chunk and print op stats."""

import glob
import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402

TREE_CACHE = "/tmp/bench_tree_d8.npz"


def get_tree(depth=8):
    from plenoctree_tpu.octree.n3tree import N3Tree

    if os.path.exists(TREE_CACHE):
        return N3Tree.load(TREE_CACHE)
    t = make_tree(depth)
    t.save(TREE_CACHE, compress=False)
    return t


def main():
    import jax
    from plenoctree_tpu.octree.renderer import VolumeRenderer
    from plenoctree_tpu.data.rays import generate_rays

    tree = get_tree()
    rend = VolumeRenderer(tree)
    rays = generate_rays(800, 800, 880.0, np.asarray(orbit_pose(0.7))[None])
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)

    t0 = time.time()
    rend.render_rays_early_stop(o[:65536], d[:65536], fast=True)
    print(f"warmup chunk: {time.time()-t0:.1f}s")

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    t0 = time.time()
    with jax.profiler.trace(logdir):
        out = rend.render_rays_early_stop(
            o[100000 : 100000 + 65536], d[100000 : 100000 + 65536], fast=True
        )
    print(f"traced chunk: {time.time()-t0:.1f}s mean={out.mean():.4f}")

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats^", {}
        )
        outp = "/tmp/op_stats.csv"
        with open(outp, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print(f"wrote {outp}")
    except Exception as e:
        print("op stats failed:", e)


if __name__ == "__main__":
    main()
