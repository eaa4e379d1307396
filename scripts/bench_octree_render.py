"""Octree render throughput benchmark (VERDICT.md round-2 task #2).

Builds a representative depth-`DEPTH` SH16 tree (sphere-shell occupancy, the
shape class the paper's blender scenes produce) and measures full-frame
render wall-clock at WIDTHxHEIGHT through the deferred two-phase renderer
(fast mode = svox render_persp(fast=True) thresholds).

Every frame uses a DIFFERENT camera pose — this environment's relay returns
repeated identical-arg executions near-instantly, so identical-pose repeat
timing is invalid (CLAUDE.md).

Env knobs: BO_RESO (default 800), BO_DEPTH (7 => reso 256, 8 => 512),
BO_FRAMES, BO_CHUNK, BO_FAST.
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def make_tree(depth, data_dim=49, seed=0):
    from plenoctree_tpu.octree.n3tree import N3Tree

    rng = np.random.default_rng(seed)
    tree = N3Tree(
        data_dim=data_dim,
        depth_limit=depth,
        radius=0.5,
        center=(0.5, 0.5, 0.5),
        data_format=f"SH{(data_dim - 1) // 3}",
        init_reserve=500000,
    )
    # Sphere shell: the dominant occupancy pattern of extracted scenes.
    n_pts = 600000
    u = rng.normal(size=(n_pts, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = 0.35 + 0.02 * rng.standard_normal(n_pts)[:, None]
    pts = 0.5 + u * r
    tree.build_from_points(pts, depth=depth, world=False)
    n = tree.n_internal
    tree.data[:n] = rng.standard_normal(tree.data[:n].shape).astype(np.float32)
    # Realistic sigma layout: empty space (coarse leaves) is ~0 like a real
    # extracted tree (σ-masking prunes it); the surface shell (max-depth
    # leaves) is dense/opaque so rays terminate after a few cells.
    tree.data[:n, ..., -1] = 0.0
    leaves = tree._leaf_nodes()
    depths = tree.parent_depth[leaves[:, 0], 1]
    deep = leaves[depths == depth]
    sig = rng.gamma(2.0, 120.0, size=deep.shape[0]).astype(np.float32)
    tree.data[deep[:, 0], deep[:, 1], deep[:, 2], deep[:, 3], -1] = sig
    return tree


def orbit_pose(theta, radius=2.2, height=0.8):
    cam = np.array(
        [radius * np.cos(theta), radius * np.sin(theta), height], np.float32
    )
    target = np.array([0.0, 0.0, 0.0], np.float32)
    fwd = target - cam
    fwd /= np.linalg.norm(fwd)
    up = np.array([0, 0, 1], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = -up2
    c2w[:3, 2] = -fwd  # OpenGL convention: camera looks along -z
    c2w[:3, 3] = cam
    return c2w


def main():
    import jax

    reso = int(os.environ.get("BO_RESO", 800))
    depth = int(os.environ.get("BO_DEPTH", 8))
    frames = int(os.environ.get("BO_FRAMES", 5))
    chunk = int(os.environ.get("BO_CHUNK", 65536))
    fast = os.environ.get("BO_FAST", "1") == "1"
    which = os.environ.get("BO_RENDERER", "tile")  # tile | march
    grid_c = int(os.environ.get("BO_GRID_C", 64))
    tile = int(os.environ.get("BO_TILE", 16))
    runrows = int(os.environ.get("BO_RUNROWS", 128))
    quantum = int(os.environ.get("BO_QUANTUM", 128))
    nbuf = int(os.environ.get("BO_NBUF", 2))

    from plenoctree_tpu.octree.renderer import VolumeRenderer
    from plenoctree_tpu.octree.tile_render import TileRenderer

    print(f"devices: {jax.devices()}")
    fx = reso * 1.1
    t0 = time.time()
    cache = f"/tmp/bench_tree_d{depth}.npz"
    if os.path.exists(cache):
        from plenoctree_tpu.octree.n3tree import N3Tree

        tree = N3Tree.load(cache)
    else:
        tree = make_tree(depth)
        tree.save(cache, compress=False)
    print(
        f"tree: depth={tree.max_depth} n_internal={tree.n_internal} "
        f"n_leaves={tree.n_leaves} data_dim={tree.data_dim} "
        f"({time.time()-t0:.1f}s build)"
    )
    t0 = time.time()
    if which == "tile":
        from plenoctree_tpu.octree.tile_render import INDEX_FORMAT_VERSION

        thr = 1e-2 if fast else 0.0
        # Index build is ~10 min of host preprocessing on the 5.6M-leaf
        # bench tree — cache it across bench invocations (static scene).
        # Key carries the index format version (bumped on build_tile_index
        # layout changes) and a tree fingerprint, so a stale cache can
        # never be loaded silently (ADVICE r3); values are plain arrays,
        # so np.savez replaces pickle.
        cache_dir = os.path.expanduser("~/.cache/plenoctree_bench")
        os.makedirs(cache_dir, exist_ok=True)
        fp = f"{tree.n_internal}i{tree.n_leaves}l{tree.data_dim}d"
        # The index layout is chunking-independent (COPY_PAD padding), so
        # runrows/nbuf/tile scans share one cache entry.
        idx_cache = os.path.join(
            cache_dir,
            f"idx_v{INDEX_FORMAT_VERSION}_{fp}_t{thr}_c{grid_c}_q{quantum}.npz",
        )
        arr_keys = ("soa", "csr", "base", "margin", "blk_bbox", "col_leaf",
                    "keep_mask")
        # One-time v5 -> v6 upgrade (same content, soa re-blocked): spares
        # the ~25 min host rebuild when only the layout changed. v5 names
        # carried a _r{runrows} segment the v6 key dropped, so glob for any
        # runrows variant (ADVICE r4). NOTE: a v5 index is padded to runrows
        # multiples rather than COPY_PAD; fine for quantum=128 piece DMAs.
        import glob as _glob

        v5_hits = sorted(
            _glob.glob(
                os.path.join(
                    cache_dir, f"idx_v5_{fp}_t{thr}_c{grid_c}_r*_q{quantum}.npz"
                )
            )
        )
        v5 = v5_hits[-1] if v5_hits else ""
        if (
            INDEX_FORMAT_VERSION == 6
            and not os.path.exists(idx_cache)
            and v5
        ):
            z = dict(np.load(v5))
            soa = z["soa"]
            z["soa"] = np.ascontiguousarray(
                soa.reshape(soa.shape[0], -1, quantum).transpose(1, 0, 2)
            )
            np.savez(idx_cache, **z)
            print(f"tile index: upgraded v5 cache -> {idx_cache}")
        index = None
        if os.environ.get("BO_IDX_CACHE", "1") == "1" and os.path.exists(idx_cache):
            import json

            import jax.numpy as jnp

            z = np.load(idx_cache)
            index = json.loads(str(z["meta_json"]))
            for k in arr_keys:
                index[k] = z[k]
            for k in ("soa", "csr", "base", "margin", "blk_bbox"):
                index[k] = jnp.asarray(index[k])
            assert index["n_instances"] > 0 and index["soa"].ndim == 3
            print(f"tile index: loaded cache {idx_cache} ({time.time()-t0:.1f}s)")
        rend = TileRenderer(
            tree,
            sigma_thresh=thr,
            stop_thresh=thr,
            grid_c=grid_c,
            output="u8",
            tile=tile,
            runrows=runrows,
            quantum=quantum,
            nbuf=nbuf,
            index=index,
        )
        if index is None and os.environ.get("BO_IDX_CACHE", "1") == "1":
            import json

            host = {k: np.asarray(rend.index[k]) for k in arr_keys}
            host["meta_json"] = json.dumps(
                {
                    k: int(v) if not isinstance(v, (list, str)) else v
                    for k, v in rend.index.items()
                    if k not in arr_keys
                }
            )
            np.savez(idx_cache, **host)
            print(f"tile index: cached to {idx_cache}")
        print(
            f"tile renderer: C={grid_c} instances={rend.index['n_instances']}"
            f" soa={rend.index['soa'].shape} ({time.time()-t0:.1f}s)"
        )

        def render(pose):
            return rend.render_persp(pose, reso, reso, fx)

    else:
        rend = VolumeRenderer(tree)
        print(
            f"march renderer: accel reso={rend.arrays['accel_reso']} "
            f"level={rend.arrays['accel_level']} ({time.time()-t0:.1f}s)"
        )

        def render(pose):
            return rend.render_persp(pose, reso, reso, fx, fast=fast, chunk=chunk)

    # Warmup frame compiles the pass/bucket ladder.
    t0 = time.time()
    img = render(orbit_pose(0.123))
    print(f"warmup frame: {time.time()-t0:.1f}s  mean={img.mean():.4f}")

    pipeline = which == "tile" and os.environ.get("BO_PIPELINE", "1") == "1"
    times = []
    if pipeline:
        # Serving throughput: keep one frame in flight — dispatch frame
        # k+1 before fetching frame k, hiding the host transfer + prep
        # behind device compute (jax dispatch is async).
        poses = [orbit_pose(0.4 + 0.31 * i) for i in range(frames)]
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
            print(
                f"frame {i}: {times[-1]*1000:.0f} ms "
                f"({1.0/times[-1]:.2f} FPS) mean={img.mean():.4f}"
            )
            pending = nxt
    else:
        for i in range(frames):
            pose = orbit_pose(0.4 + 0.31 * i)
            t0 = time.time()
            img = render(pose)
            dt = time.time() - t0
            times.append(dt)
            print(
                f"frame {i}: {dt*1000:.0f} ms  ({1.0/dt:.2f} FPS) "
                f"mean={img.mean():.4f}"
            )

    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(
        f"RESULT reso={reso} depth={depth} fast={fast} pipeline={pipeline}: "
        f"median {med*1000:.0f} ms ({1/med:.2f} FPS), best {best*1000:.0f} ms "
        f"({1/best:.2f} FPS)"
    )


if __name__ == "__main__":
    main()
