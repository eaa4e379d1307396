"""Probe: split the deferred renderer's frame cost into march-dispatch,
alive-sync, compaction, and shading components on the real chip."""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from plenoctree_tpu.octree.renderer import VolumeRenderer
    from plenoctree_tpu.octree import march as march_lib
    from plenoctree_tpu.data.rays import generate_rays

    depth = int(os.environ.get("BO_DEPTH", 8))
    tree = make_tree(depth)
    rend = VolumeRenderer(tree)
    dr = rend._get_deferred(True)

    reso = 800
    fx = reso * 1.1
    rays = generate_rays(reso, reso, fx, np.asarray(orbit_pose(0.7))[None])
    o = rays.origins.reshape(-1, 3)[:65536]
    d = rays.directions.reshape(-1, 3)[:65536]

    rp = dr._prep(o, d)
    carry = march_lib.init_carry(rp, 65536, dr.K)
    # Warmup compile
    c1 = dr._march(dr.tables, rp, carry, n_segments=48)
    jax.block_until_ready(c1)
    a = dr._alive(rp, c1)
    jax.block_until_ready(a)

    # Measure pure dispatch+exec of a march pass (fresh carry each time to
    # vary inputs; the relay shortcut only hits identical args).
    for segs in (8, 48):
        ts = []
        cur = carry
        for i in range(5):
            t0 = time.time()
            cur = dr._march(dr.tables, rp, cur, n_segments=segs)
            jax.block_until_ready(cur)
            ts.append(time.time() - t0)
        print(f"march n_segments={segs}: {[f'{t*1000:.0f}' for t in ts]} ms "
              f"-> {min(ts)*1000/segs:.2f} ms/segment (65536 rays)")

    # alive computation + host transfer
    ts = []
    cur2 = carry
    for i in range(5):
        cur2 = dr._march(dr.tables, rp, cur2, n_segments=8)
        t0 = time.time()
        av = np.asarray(dr._alive(rp, cur2))
        ts.append(time.time() - t0)
    print(f"alive+host sync: {[f'{t*1000:.0f}' for t in ts]} ms, alive={av.sum()}")

    # Null dispatch round trip (tiny op, fresh input)
    f = jax.jit(lambda x: x + 1)
    xs = [jnp.full((8,), i, jnp.float32) for i in range(6)]
    _ = jax.block_until_ready(f(xs[0]))
    ts = []
    for x in xs[1:]:
        t0 = time.time()
        jax.block_until_ready(f(x))
        ts.append(time.time() - t0)
    print(f"null dispatch rtt: {[f'{t*1000:.1f}' for t in ts]} ms")


if __name__ == "__main__":
    main()
