"""Capture a jax.profiler trace of bench-config train steps; print op stats.

Answers VERDICT r4 weak-#1: where do the ~48 ms/step go at batch 4096
(fused Pallas trunk vs XLA sampling/decode/compositing/RNG)? Writes
/tmp/train_op_stats.csv and prints the top self-time ops.

Env knobs mirror bench.py: BENCH_BATCH/BENCH_DTYPE/BENCH_PALLAS/BENCH_RBG.
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import glob


def main():
    import jax

    if os.environ.get("BENCH_RBG", "0") == "1":
        jax.config.update("jax_default_prng_impl", "rbg")
    from jax import random

    from plenoctree_tpu import engine
    from plenoctree_tpu.data import get_dataset
    from plenoctree_tpu.models import get_model_state
    from plenoctree_tpu.parallel import make_mesh, prefetch_to_device
    from plenoctree_tpu.parallel.partition import shard_train_state
    from plenoctree_tpu.utils.config import default_config

    batch_size = int(os.environ.get("BENCH_BATCH", 4096))
    cfg = default_config(
        dataset="synthetic",
        sh_deg=3,
        use_viewdirs=False,
        num_coarse_samples=64,
        num_fine_samples=128,
        batch_size=batch_size,
        image_batching=True,
        sparsity_npoints=10000,
        max_steps=2000000,
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
    )
    mesh = make_mesh()
    model, state = get_model_state(random.PRNGKey(0), cfg, restore=False)
    state = shard_train_state(state, mesh)
    train_step = engine.make_train_step(model, cfg, mesh)
    ds = get_dataset("train", cfg, prefetch=True)
    rng = random.PRNGKey(1)
    batches = prefetch_to_device(ds, mesh, size=3)

    for _ in range(5):
        state, stats, _ = train_step(state, next(batches), rng)
    jax.block_until_ready(stats.loss)

    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state, stats, _ = train_step(state, next(batches), rng)
    jax.block_until_ready(stats.loss)
    dt = time.perf_counter() - t0
    print(
        f"steady state: {dt / n * 1e3:.2f} ms/step, "
        f"{batch_size * n / dt:,.0f} rays/s"
    )

    logdir = "/tmp/jaxtrace_train"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, stats, _ = train_step(state, next(batches), rng)
        jax.block_until_ready(stats.loss)

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats^", {}
        )
        outp = "/tmp/train_op_stats.csv"
        with open(outp, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print(f"wrote {outp}")
        import csv

        with open(outp) as f:
            rows = list(csv.DictReader(f))
        key = None
        for cand in ("Total self-time (us)", "total_self_time_ps", "Self time (us)"):
            if rows and cand in rows[0]:
                key = cand
                break
        if key is None and rows:
            print("columns:", list(rows[0].keys()))
            return
        rows.sort(key=lambda r: -float(r[key] or 0))
        tot = sum(float(r[key] or 0) for r in rows)
        print(f"top ops by self time ({key}, total {tot:,.0f}):")
        for r in rows[:25]:
            frac = float(r[key] or 0) / max(tot, 1)
            print(
                f"  {frac*100:5.1f}%  {r.get('Type', r.get('category', ''))!s:24s}"
                f" {r.get('Operation', r.get('op_name', ''))!s:.90s}"
            )
    except Exception as e:
        print("op stats failed:", e)


if __name__ == "__main__":
    main()
