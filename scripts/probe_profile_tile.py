"""Capture a jax.profiler trace of tile-renderer frames and print op stats."""

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


def load_cached_index():
    """Reuse bench_octree_render's persisted index if present."""
    import glob as g
    import json

    import jax.numpy as jnp

    from plenoctree_tpu.octree.tile_render import INDEX_FORMAT_VERSION

    hits = sorted(
        g.glob(os.path.expanduser(
            f"~/.cache/plenoctree_bench/idx_v{INDEX_FORMAT_VERSION}_"
            "*_t0.01_c64_*.npz"))
    )
    if not hits:
        return None
    z = np.load(hits[-1])
    index = json.loads(str(z["meta_json"]))
    for k in ("soa", "csr", "base", "margin", "blk_bbox", "col_leaf", "keep_mask"):
        index[k] = z[k]
    for k in ("soa", "csr", "base", "margin", "blk_bbox"):
        index[k] = jnp.asarray(index[k])
    assert index["n_instances"] > 0 and index["soa"].ndim == 3
    print(f"loaded cached index {hits[-1]}")
    return index


def main():
    import jax

    from plenoctree_tpu.octree.tile_render import TileRenderer

    reso = int(os.environ.get("BO_RESO", 800))
    runrows = int(os.environ.get("BO_RUNROWS", 128))
    nbuf = int(os.environ.get("BO_NBUF", 2))
    tree = get_tree()
    t0 = time.time()
    # The persisted index is chunking-independent (COPY_PAD): any runrows
    # reuses it.
    index = load_cached_index()
    rend = TileRenderer(
        tree, sigma_thresh=1e-2, stop_thresh=1e-2, grid_c=64, output="u8",
        index=index, runrows=runrows, nbuf=nbuf,
    )
    print(f"index build: {time.time()-t0:.1f}s  inst={rend.index['n_instances']}")
    fx = reso * 1.1

    t0 = time.time()
    img = rend.render_persp(orbit_pose(0.123), reso, reso, fx)
    print(f"warmup: {time.time()-t0:.1f}s mean={img.mean():.3f} rcap={rend.rcap}")

    logdir = "/tmp/jaxtrace_tile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(2):
            t0 = time.time()
            rend.render_persp(orbit_pose(0.5 + 0.3 * i), reso, reso, fx)
            print(f"frame {i}: {(time.time()-t0)*1000:.0f} ms")

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats^", {}
        )
        import gzip
        import io
        import csv

        text = data
        if isinstance(text, bytes):
            try:
                text = gzip.decompress(text).decode()
            except OSError:
                text = text.decode()
        rows = list(csv.reader(io.StringIO(text)))
        hdr = rows[0]
        print(hdr)
        it = hdr.index("Total self-time (us)") if "Total self-time (us)" in hdr else 7
        name_i = hdr.index("Operation") if "Operation" in hdr else 2
        ranked = sorted(rows[1:], key=lambda r: -float(r[it] or 0))
        for r in ranked[:25]:
            print(f"{float(r[it]):>12.0f} us  {r[name_i][:90]}")
    except Exception as e:  # pragma: no cover
        print("op-stats tooling unavailable:", e)


if __name__ == "__main__":
    main()
