"""Benchmark: NeRF-SH training throughput on the flagship config.

Measures train rays/sec on the paper blender config (8x256 trunk, SH deg 3,
64 coarse + 128 fine samples — nerf_sh/config/blender.yaml) on the attached
TPU chip(s), on the procedural synthetic dataset (no external data needed).

Baseline: JaxNeRF(-SH) on one V100 trains ~2M steps @ batch 1024 in ~1.4
days ≈ 16.5 steps/s ≈ 17,000 rays/sec/GPU (google/jaxnerf README; the
reference repo logs the same counter, nerf_sh/train.py:224, but publishes no
number — BASELINE.md). vs_baseline = rays_per_sec_per_chip / 17000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_RAYS_PER_SEC = 17000.0  # JaxNeRF V100 rays/sec/GPU (see docstring)


def _watchdog():
    """Emit an honest failure line instead of hanging the driver.

    The axon relay has had multi-hour outages (STATUS.md); backend init or
    a remote compile can then block forever. If no measurement has been
    printed within BENCH_DEADLINE seconds (default 20 min — first remote
    compiles are slow but bounded), print a value-0 JSON line and exit."""
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE", 1200))

    def fire():
        print(
            json.dumps(
                {
                    "metric": "train_rays_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "rays/s/chip (TPU relay unreachable within "
                    f"{int(deadline)}s — see STATUS.md relay outages)",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _watchdog()
    import jax

    if os.environ.get("BENCH_RBG", "0") == "1":
        # Hardware PRNG: much cheaper random bits on TPU than threefry for
        # the per-step stratified/importance draws; streams differ but the
        # sampling semantics are identical.
        jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np
    from jax import random

    from plenoctree_tpu import engine
    from plenoctree_tpu.data import get_dataset
    from plenoctree_tpu.models import get_model_state
    from plenoctree_tpu.parallel import make_mesh, prefetch_to_device, shard_pytree_batch
    from plenoctree_tpu.parallel.partition import shard_train_state
    from plenoctree_tpu.utils.config import default_config

    batch_size = int(os.environ.get("BENCH_BATCH", 4096))
    # 100-step window: the 50-step default measured ±0.6% run-to-run on the
    # tunneled chip; 100 steps tightens it and matches the round-5 A/B
    # protocol (85.1-85.2k rays/s at this setting).
    steps = int(os.environ.get("BENCH_STEPS", 100))
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
        mesh_shape=os.environ.get("BENCH_MESH", ""),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
    )

    mesh = make_mesh()
    n_chips = len(jax.devices())
    model, state = get_model_state(random.PRNGKey(0), cfg, restore=False)
    state = shard_train_state(state, mesh)
    train_step = engine.make_train_step(model, cfg, mesh)
    ds = get_dataset("train", cfg, prefetch=True)
    rng = random.PRNGKey(1)

    # Device prefetch (parity: flax prefetch_to_device(dataset, 3) in the
    # reference train loop) — the step loop never blocks on host->device.
    batches = prefetch_to_device(ds, mesh, size=3)

    # Warmup (compile + first steps).
    for _ in range(5):
        state, stats, _ = train_step(state, next(batches), rng)
    jax.block_until_ready(stats.loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, stats, _ = train_step(state, next(batches), rng)
    jax.block_until_ready(stats.loss)
    dt = time.perf_counter() - t0

    rays_per_sec = batch_size * steps / dt
    per_chip = rays_per_sec / n_chips
    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": f"rays/s/chip (batch {batch_size}, 64c+128f, 8x256 SH16)",
                "vs_baseline": round(per_chip / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
