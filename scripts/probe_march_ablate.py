"""Ablate the march step to find what costs 148ms/segment @65536 rays.

Timing: diff two scan lengths inside one jit (K_HI - K_LO), fresh ray batch
per timed call (relay quirk).
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402

K_LO, K_HI = 8, 56
R = 65536


def time_variant(name, make_scan, fresh_args):
    import jax

    runs = {}
    for K in (K_LO, K_HI):
        fn = make_scan(K)
        jax.block_until_ready(fn(*fresh_args()))  # compile
        best = float("inf")
        for _ in range(3):
            a = fresh_args()
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        runs[K] = best
    per_seg = (runs[K_HI] - runs[K_LO]) / (K_HI - K_LO)
    print(f"{name:34s}: {per_seg*1000:7.2f} ms/segment  ({per_seg/R*1e9:6.0f} ns/ray-step)")


def main():
    import jax
    import jax.numpy as jnp
    from plenoctree_tpu.octree.renderer import (
        VolumeRenderer,
        _locate,
        _prep_rays,
        split_arrays,
        _descend,
    )

    depth = int(os.environ.get("BO_DEPTH", 8))
    tree = make_tree(depth)
    rend = VolumeRenderer(tree)
    tables, meta = split_arrays(rend.arrays)
    sigma_tab = tables["sigma"]
    accel = tables["accel"]
    child = tables["child"]
    reso_g = meta.accel_reso

    fx = 880.0
    from plenoctree_tpu.data.rays import generate_rays

    pose_i = [0]

    def fresh_rays():
        pose_i[0] += 1
        rays = generate_rays(800, 800, fx, np.asarray(orbit_pose(0.2 + 0.13 * pose_i[0]))[None])
        o = jnp.asarray(rays.origins.reshape(-1, 3)[100000 : 100000 + R])
        d = jnp.asarray(rays.directions.reshape(-1, 3)[100000 : 100000 + R])
        return _prep_rays(tables, o, d, rend.fmt, rend.basis_dim)[:4] + (
            _prep_rays(tables, o, d, rend.fmt, rend.basis_dim)[4],
        )

    def scan_full(K):
        @jax.jit
        def run(o, dn, safe_dn, delta_scale, tmin):
            def step(c, _):
                t, light = c
                pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
                cell, corner, size = _locate(tables, meta, pos)
                sigma = jnp.maximum(sigma_tab[cell], 0.0)
                far = corner + (dn > 0) * size[..., None]
                t_exit = jnp.min((far - pos) / safe_dn, axis=-1)
                dt = jnp.maximum(t_exit, 0.0) + 1e-4
                att = jnp.exp(-dt * delta_scale * sigma)
                return (t + dt, light * att), None

            (t, light), _ = jax.lax.scan(step, (tmin, jnp.ones_like(tmin)), None, length=K)
            return t + light

        return run

    def scan_no_sigma(K):
        @jax.jit
        def run(o, dn, safe_dn, delta_scale, tmin):
            def step(c, _):
                t, light = c
                pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
                cell, corner, size = _locate(tables, meta, pos)
                far = corner + (dn > 0) * size[..., None]
                t_exit = jnp.min((far - pos) / safe_dn, axis=-1)
                dt = jnp.maximum(t_exit, 0.0) + 1e-4
                return (t + dt, light * (1.0 + 1e-9 * cell)), None

            (t, light), _ = jax.lax.scan(step, (tmin, jnp.ones_like(tmin)), None, length=K)
            return t + light

        return run

    def scan_accel_only(K):
        """Accel grid word only: voxel-step DDA (exit of the GRID voxel)."""

        @jax.jit
        def run(o, dn, safe_dn, delta_scale, tmin):
            def step(c, _):
                t, light = c
                pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
                v = jnp.clip((pos * reso_g).astype(jnp.int32), 0, reso_g - 1)
                word = accel[(v[..., 0] * reso_g + v[..., 1]) * reso_g + v[..., 2]]
                vc = v.astype(pos.dtype) / reso_g
                far = vc + (dn > 0) * (1.0 / reso_g)
                t_exit = jnp.min((far - pos) / safe_dn, axis=-1)
                dt = jnp.maximum(t_exit, 0.0) + 1e-4
                return (t + dt, light * (1.0 + 1e-9 * word)), None

            (t, light), _ = jax.lax.scan(step, (tmin, jnp.ones_like(tmin)), None, length=K)
            return t + light

        return run

    def scan_no_gather(K):
        @jax.jit
        def run(o, dn, safe_dn, delta_scale, tmin):
            def step(c, _):
                t, light = c
                pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
                v = jnp.clip((pos * reso_g).astype(jnp.int32), 0, reso_g - 1)
                vc = v.astype(pos.dtype) / reso_g
                far = vc + (dn > 0) * (1.0 / reso_g)
                t_exit = jnp.min((far - pos) / safe_dn, axis=-1)
                dt = jnp.maximum(t_exit, 0.0) + 1e-4
                return (t + dt, light * (1.0 - 1e-9 * dt)), None

            (t, light), _ = jax.lax.scan(step, (tmin, jnp.ones_like(tmin)), None, length=K)
            return t + light

        return run

    # small-table variant: sigma from a u8 64^3 grid (0.26 MB)
    small = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, size=(64**3,), dtype=np.uint8)
    )

    def scan_small_grid(K):
        @jax.jit
        def run(o, dn, safe_dn, delta_scale, tmin):
            def step(c, _):
                t, light = c
                pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
                v = jnp.clip((pos * 64).astype(jnp.int32), 0, 63)
                w = small[(v[..., 0] * 64 + v[..., 1]) * 64 + v[..., 2]]
                vc = v.astype(pos.dtype) / 64
                far = vc + (dn > 0) * (1.0 / 64)
                t_exit = jnp.min((far - pos) / safe_dn, axis=-1)
                dt = jnp.maximum(t_exit, 0.0) + 1e-4
                return (t + dt, light * (1.0 + 1e-9 * w)), None

            (t, light), _ = jax.lax.scan(step, (tmin, jnp.ones_like(tmin)), None, length=K)
            return t + light

        return run

    print(f"tree depth={tree.max_depth} accel reso={reso_g} (R={R} rays)")
    time_variant("no gathers (DDA arithmetic)", scan_no_gather, fresh_rays)
    time_variant("u8 64^3 grid gather (0.26MB)", scan_small_grid, fresh_rays)
    time_variant("accel i32 gather only (64MB)", scan_accel_only, fresh_rays)
    time_variant("locate (accel+residual descend)", scan_no_sigma, fresh_rays)
    time_variant("full (locate+sigma)", scan_full, fresh_rays)


if __name__ == "__main__":
    main()
