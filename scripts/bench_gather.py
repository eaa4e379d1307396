"""Microbenchmark: random-row access mechanisms on the TPU chip.

Measures ns/row for the access patterns available to the octree ray-marcher.
Timing discipline (CLAUDE.md): the relay returns repeated identical-arg calls
near-instantly, so every timed call gets FRESH index arrays; per-call RPC
overhead is cancelled by differencing two loop lengths (K_hi - K_lo steps
inside one jit).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

K_LO, K_HI = 32, 256


def measure(make_run, make_idx, rays):
    """Returns ns/row via (t_hi - t_lo) / ((K_HI-K_LO) * rays)."""
    run = make_run()
    # Warm up compiles for both shapes.
    jax.block_until_ready(run(make_idx(K_LO)))
    jax.block_until_ready(run(make_idx(K_HI)))
    ts = {}
    for K in (K_LO, K_HI):
        best = float("inf")
        for _ in range(3):
            idx = make_idx(K)  # fresh indices each rep
            jax.block_until_ready(idx)
            t0 = time.perf_counter()
            jax.block_until_ready(run(idx))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[K_HI] - ts[K_LO]) / ((K_HI - K_LO) * rays) * 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--table_rows", type=int, default=1 << 20)
    p.add_argument("--vmem_rows", type=int, default=1 << 15)
    p.add_argument("--dim", type=int, default=56)
    p.add_argument("--rays", type=int, default=8192)
    args = p.parse_args()
    R, D, T = args.rays, args.dim, args.table_rows

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    table = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    vtable = table[: args.vmem_rows]
    grid = jnp.asarray(rng.integers(0, 2**31, size=(T,)).astype(np.uint32))

    def idx_hbm(K):
        return jnp.asarray(rng.integers(0, T - 4, size=(K, R)).astype(np.int32))

    def idx_vmem(K):
        return jnp.asarray(rng.integers(0, args.vmem_rows, size=(K, R)).astype(np.int32))

    # --- XLA gather variants -------------------------------------------------
    def xla_gather(slice_rows, tab):
        def make():
            @jax.jit
            def run(idx_steps):
                def step(acc, idx):
                    if slice_rows == 1:
                        rows = tab[idx]
                    else:
                        rows = tab[idx[:, None] + jnp.arange(slice_rows)[None, :]]
                        rows = rows.sum(1)
                    return acc + rows.sum(0), None

                acc, _ = jax.lax.scan(step, jnp.zeros((tab.shape[1],), tab.dtype), idx_steps)
                return acc

            return run

        return make

    def xla_gather_u32():
        @jax.jit
        def run(idx_steps):
            def step(acc, idx):
                return acc + grid[idx].sum(), None

            acc, _ = jax.lax.scan(step, jnp.uint32(0), idx_steps)
            return acc

        return run

    print(f"xla_gather_1     : {measure(xla_gather(1, table), idx_hbm, R):7.2f} ns/row")
    print(f"xla_gather_4     : {measure(xla_gather(4, table), idx_hbm, R):7.2f} ns/row (x4 rows each)")
    print(f"xla_gather_u32   : {measure(xla_gather_u32, idx_hbm, R):7.2f} ns/row")
    print(f"xla_gather_vmtab : {measure(xla_gather(1, vtable), idx_vmem, R):7.2f} ns/row (32k-row table)")

    # --- Pallas: VMEM-resident table, scalar dynamic row loads ---------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pallas_vmem(unroll):
        def make():
            def kernel(idx_ref, table_ref, out_ref, acc_ref):
                k = pl.program_id(0)

                @pl.when(k == 0)
                def _():
                    acc_ref[:, :] = jnp.zeros_like(acc_ref)

                def inner(r, _):
                    for u in range(unroll):
                        i = idx_ref[0, r * unroll + u]
                        acc_ref[:, :] += table_ref[pl.ds(i, 1), :]
                    return 0

                jax.lax.fori_loop(0, R // unroll, inner, 0)

                @pl.when(k == pl.num_programs(0) - 1)
                def _():
                    out_ref[:, :] = acc_ref[:, :]

            @jax.jit
            def run(idx_steps):
                K = idx_steps.shape[0]
                return pl.pallas_call(
                    kernel,
                    grid=(K,),
                    out_shape=jax.ShapeDtypeStruct((1, D), vtable.dtype),
                    in_specs=[
                        pl.BlockSpec((1, R), lambda k: (k, 0), memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, D), lambda k: (0, 0), memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((1, D), vtable.dtype)],
                )(idx_steps, vtable)

            return run

        return make

    def pallas_vmem_tile():
        """Pack 8 gathered rows into one (8, D) tile before accumulating."""
        def kernel(idx_ref, table_ref, out_ref, acc_ref, tile_ref):
            k = pl.program_id(0)

            @pl.when(k == 0)
            def _():
                acc_ref[:, :] = jnp.zeros_like(acc_ref)

            def inner(r8, _):
                for u in range(8):
                    i = idx_ref[0, r8 * 8 + u]
                    tile_ref[pl.ds(u, 1), :] = table_ref[pl.ds(i, 1), :]
                acc_ref[:, :] += tile_ref[:, :]
                return 0

            jax.lax.fori_loop(0, R // 8, inner, 0)

            @pl.when(k == pl.num_programs(0) - 1)
            def _():
                out_ref[:, :] = acc_ref[:, :]

        @jax.jit
        def run(idx_steps):
            K = idx_steps.shape[0]
            return pl.pallas_call(
                kernel,
                grid=(K,),
                out_shape=jax.ShapeDtypeStruct((8, D), vtable.dtype),
                in_specs=[
                    pl.BlockSpec((1, R), lambda k: (k, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, D), lambda k: (0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((8, D), vtable.dtype),
                    pltpu.VMEM((8, D), vtable.dtype),
                ],
            )(idx_steps, vtable)

        return run

    for name, make in [
        ("pallas_vmem_u1  ", pallas_vmem(1)),
        ("pallas_vmem_u8  ", pallas_vmem(8)),
        ("pallas_vmem_tile", pallas_vmem_tile),
    ]:
        try:
            ns = measure(make, idx_vmem, R)
            print(f"{name} : {ns:7.2f} ns/row (table {args.vmem_rows} rows in VMEM)")
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
