"""Confirm the slot-carry writes dominate march_pass cost; test alternatives.

Variants:
  A. full step, no slots (reduce cell/dt into scalars)      [baseline 41ns]
  B. full step + [R,K] slot writes in carry (march_pass-style)
  C. full step + per-step stacked outputs (scan ys), no slot carry
  D. actual march_pass
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402

K_LO, K_HI = 8, 40
R = 65536
KSLOT = 64


def time_variant(name, make_scan, fresh_args):
    import jax

    runs = {}
    for K in (K_LO, K_HI):
        fn = make_scan(K)
        jax.block_until_ready(fn(fresh_args()))
        best = float("inf")
        for _ in range(3):
            a = fresh_args()
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(a))
            best = min(best, time.perf_counter() - t0)
        runs[K] = best
    per_seg = (runs[K_HI] - runs[K_LO]) / (K_HI - K_LO)
    print(f"{name:44s}: {per_seg*1000:7.2f} ms/segment ({per_seg/R*1e9:5.0f} ns/ray-step)")


def main():
    import jax
    import jax.numpy as jnp
    from plenoctree_tpu.octree.renderer import (
        VolumeRenderer, _locate, _prep_rays, split_arrays,
    )
    from plenoctree_tpu.octree import march as march_lib
    from plenoctree_tpu.data.rays import generate_rays

    tree = make_tree(int(os.environ.get("BO_DEPTH", 8)))
    rend = VolumeRenderer(tree)
    tables, meta = split_arrays(rend.arrays)
    sigma_tab = tables["sigma"]
    opts = rend.opts

    pose_i = [0]

    def fresh_rp():
        pose_i[0] += 1
        rays = generate_rays(800, 800, 880.0, np.asarray(orbit_pose(0.2 + 0.13 * pose_i[0]))[None])
        o = jnp.asarray(rays.origins.reshape(-1, 3)[100000 : 100000 + R])
        d = jnp.asarray(rays.directions.reshape(-1, 3)[100000 : 100000 + R])
        return _prep_rays(tables, o, d, rend.fmt, rend.basis_dim)

    def core_step(t, light, o, dn, safe_dn, delta_scale, tmax):
        active = (t <= tmax) & (light > 1e-2)
        pos = jnp.where(active[..., None], jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7), 0.0)
        cell, corner, size = _locate(tables, meta, pos)
        sigma = jnp.maximum(sigma_tab[cell], 0.0)
        far = corner + (dn > 0) * size[..., None]
        t_exit = jnp.min((far - pos) / safe_dn, axis=-1)
        dt = jnp.maximum(t_exit, 0.0) + 1e-4
        keep = sigma >= 1e-2
        att = jnp.where(keep, jnp.exp(-dt * delta_scale * sigma), 1.0)
        push = active & keep
        return active, cell, dt, att, push

    def scan_noslots(K):
        @jax.jit
        def run(rp):
            o, dn, safe_dn, delta_scale, tmin, tmax, _ = rp

            def step(c, _):
                t, light, acc = c
                active, cell, dt, att, push = core_step(t, light, o, dn, safe_dn, delta_scale, tmax)
                acc = acc + jnp.where(push, cell.astype(jnp.float32) * dt, 0.0)
                return (jnp.where(active, t + dt, t), jnp.where(active, light * att, light), acc), None

            (t, light, acc), _ = jax.lax.scan(
                step, (tmin, jnp.ones_like(tmin), jnp.zeros_like(tmin)), None, length=K)
            return t + light + acc

        return run

    iota_k = None

    def scan_slot_carry(K):
        import jax.numpy as jnp
        iota = jnp.arange(KSLOT, dtype=jnp.int32)[None, :]

        @jax.jit
        def run(rp):
            o, dn, safe_dn, delta_scale, tmin, tmax, _ = rp
            init = (tmin, jnp.ones_like(tmin), jnp.zeros((R,), jnp.int32),
                    jnp.zeros((R, KSLOT), jnp.int32), jnp.zeros((R, KSLOT), jnp.float32))

            def step(c, _):
                t, light, count, cells, dts = c
                active, cell, dt, att, push = core_step(t, light, o, dn, safe_dn, delta_scale, tmax)
                push = push & (count < KSLOT)
                oh = (iota == count[:, None]) & push[:, None]
                return (jnp.where(active, t + dt, t), jnp.where(active, light * att, light),
                        count + push.astype(jnp.int32),
                        jnp.where(oh, cell[:, None], cells),
                        jnp.where(oh, (dt * delta_scale)[:, None], dts)), None

            c, _ = jax.lax.scan(step, init, None, length=K)
            return c[0] + c[1] + c[2] + c[3][:, 0] + c[4][:, 0]

        return run

    def scan_stacked(K):
        @jax.jit
        def run(rp):
            o, dn, safe_dn, delta_scale, tmin, tmax, _ = rp

            def step(c, _):
                t, light = c
                active, cell, dt, att, push = core_step(t, light, o, dn, safe_dn, delta_scale, tmax)
                return (jnp.where(active, t + dt, t), jnp.where(active, light * att, light)), (
                    cell, (dt * delta_scale).astype(jnp.float32), push)

            (t, light), ys = jax.lax.scan(step, (tmin, jnp.ones_like(tmin)), None, length=K)
            cells, dts, push = ys  # [K, R]
            return t + light + cells[0, :].astype(jnp.float32) + dts[0, :] + push[0, :]

        return run

    def scan_marchpass(K):
        @jax.jit
        def run(rp):
            carry = march_lib.init_carry(rp, R, KSLOT)
            c = march_lib.march_pass(tables, rp, carry, meta, opts_fast, K)
            return c["t"] + c["light"] + c["cells"][:, 0].astype(jnp.float32)

        return run

    from dataclasses import replace
    opts_fast = replace(opts, sigma_thresh=1e-2, stop_thresh=1e-2)

    print(f"tree depth={tree.max_depth} accel reso={meta.accel_reso} R={R} K={KSLOT}")
    time_variant("A full step, scalar reduce (no slots)", scan_noslots, fresh_rp)
    time_variant("C full step, stacked ys outputs", scan_stacked, fresh_rp)
    time_variant("B full step, [R,64] slot carry", scan_slot_carry, fresh_rp)
    time_variant("D actual march_pass", scan_marchpass, fresh_rp)


if __name__ == "__main__":
    main()
