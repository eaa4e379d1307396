"""Second-round access-pattern measurements for the deferred renderer.

Cases (all on a 1M-row x 56-col f32 table, the depth-7/8 color-table scale):
  uniform      — uniform random rows (round-2 baseline: ~59 ns/row)
  mostly_zero  — 90% of indices are row 0 (dead rays / padded slots)
  sorted       — sorted random rows (cell-sorted contributor shading)
  local        — rows within a 32k-row window (ray-coherent tile access)
  scatter_add  — uniform scatter-add of rows (shade backward)
  u32_64mb     — u32 gathers from a 16M-entry grid (256^3 budgeted accel)
  pallas_vmem  — Pallas scalar-loop loads from a VMEM-resident table
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

K_LO, K_HI = 32, 256
R = 8192
D = 56
T = 1 << 20


def measure(make_run, make_idx, rays=R):
    run = make_run()
    jax.block_until_ready(run(make_idx(K_LO)))
    jax.block_until_ready(run(make_idx(K_HI)))
    ts = {}
    for K in (K_LO, K_HI):
        best = float("inf")
        for _ in range(3):
            idx = make_idx(K)
            jax.block_until_ready(idx)
            t0 = time.perf_counter()
            jax.block_until_ready(run(idx))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[K_HI] - ts[K_LO]) / ((K_HI - K_LO) * rays) * 1e9


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    table = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))

    def gather_run():
        @jax.jit
        def run(idx_steps):
            def step(acc, idx):
                return acc + table[idx].sum(0), None

            acc, _ = jax.lax.scan(step, jnp.zeros((D,), jnp.float32), idx_steps)
            return acc

        return run

    def idx_uniform(K):
        return jnp.asarray(rng.integers(0, T, size=(K, R)).astype(np.int32))

    def idx_mostly_zero(K):
        idx = rng.integers(0, T, size=(K, R)).astype(np.int32)
        mask = rng.random((K, R)) < 0.9
        idx[mask] = 0
        return jnp.asarray(idx)

    def idx_sorted(K):
        idx = rng.integers(0, T, size=(K, R)).astype(np.int32)
        return jnp.asarray(np.sort(idx, axis=1))

    def idx_local(K):
        base = rng.integers(0, T - (1 << 15), size=(K, 1))
        off = rng.integers(0, 1 << 15, size=(K, R))
        return jnp.asarray((base + off).astype(np.int32))

    print(f"uniform     : {measure(gather_run, idx_uniform):7.2f} ns/row")
    print(f"mostly_zero : {measure(gather_run, idx_mostly_zero):7.2f} ns/row")
    print(f"sorted      : {measure(gather_run, idx_sorted):7.2f} ns/row")
    print(f"local_32k   : {measure(gather_run, idx_local):7.2f} ns/row")

    def scatter_run():
        vals = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))

        @jax.jit
        def run(idx_steps):
            def step(acc, idx):
                return acc.at[idx].add(vals), None

            acc, _ = jax.lax.scan(step, jnp.zeros((T, D), jnp.float32), idx_steps)
            return acc.sum()

        return run

    print(f"scatter_add : {measure(scatter_run, idx_uniform):7.2f} ns/row")

    grid = jnp.asarray(rng.integers(0, 2**31, size=(1 << 24,)).astype(np.uint32))

    def grid_run():
        @jax.jit
        def run(idx_steps):
            def step(acc, idx):
                return acc + grid[idx].sum(), None

            acc, _ = jax.lax.scan(step, jnp.uint32(0), idx_steps)
            return acc

        return run

    def idx_grid(K):
        return jnp.asarray(rng.integers(0, 1 << 24, size=(K, R)).astype(np.int32))

    print(f"u32_64mb    : {measure(grid_run, idx_grid):7.2f} ns/row")

    # Pallas: VMEM-resident table, scalar dynamic loads. idx lives in VMEM
    # as (R, K) with rays on the sublane axis (block = whole array).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    VT = 1 << 15
    vtable = table[:VT]

    def pallas_run():
        def kernel(idx_ref, table_ref, out_ref, acc_ref):
            K = idx_ref.shape[1]

            def body(r, _):
                def inner(k, _):
                    i = idx_ref[r, k]
                    acc_ref[:, :] += table_ref[pl.ds(i, 1), :]
                    return 0

                jax.lax.fori_loop(0, K, inner, 0)
                return 0

            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            jax.lax.fori_loop(0, R, body, 0)
            out_ref[:, :] = acc_ref[:, :]

        @jax.jit
        def run(idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
            )(idx, vtable)

        return run

    def idx_pallas(K):
        return jnp.asarray(rng.integers(0, VT, size=(R, K)).astype(np.int32))

    try:
        ns = measure(pallas_run, idx_pallas)
        print(f"pallas_vmem : {ns:7.2f} ns/row (32k-row table in VMEM)")
    except Exception as e:  # noqa: BLE001
        print(f"pallas_vmem FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
