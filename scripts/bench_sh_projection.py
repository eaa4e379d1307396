"""Wall-clock for vanilla-NeRF -> SH projection (VERDICT round-2 task #9).

Reference anchor: projecting a view-dependent NeRF onto SH via Monte-Carlo
sampling costs ~2 min at 100 dirs and ~2 h at 10k dirs per scene on GPU
(reference README.md:173-174, "--projection_samples").

Times `octree/extract.py::project_nerf_to_sh` on a random-weight NeRF with
viewdirs (weights don't affect cost) over a realistic extraction workload.
Env: SHP_POINTS (default 65536 leaf sample points), SHP_SAMPLES (dirs).
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    from jax import random

    from plenoctree_tpu.models import get_model_state
    from plenoctree_tpu.octree.extract import project_nerf_to_sh
    from plenoctree_tpu.utils.config import default_config

    n_points = int(os.environ.get("SHP_POINTS", 65536))
    cfg = default_config(
        dataset="synthetic",
        sh_deg=-1,  # vanilla NeRF: view-dependent head, projection needed
        use_viewdirs=True,
        num_coarse_samples=64,
        num_fine_samples=128,
        batch_size=1024,
        chunk=8192,
    )
    model, state = get_model_state(random.PRNGKey(0), cfg, restore=False)

    import functools

    @jax.jit
    def eval_cross(points, dirs):
        return model.apply(
            state.variables, points, dirs, method=model.eval_points_raw
        )

    def points_fn_cross(points, dirs):
        return eval_cross(points, dirs)

    pts = np.random.default_rng(0).uniform(-1, 1, (n_points, 3)).astype(np.float32)
    for samples in (int(s) for s in os.environ.get("SHP_SAMPLES", "100,1000,10000").split(",")):
        t0 = time.time()
        rgb, sigma = project_nerf_to_sh(
            points_fn_cross, 3, pts, samples, np.random.default_rng(1)
        )
        jax.block_until_ready((rgb, sigma))
        dt = time.time() - t0
        print(
            f"projection_samples={samples}: {dt:.1f}s for {n_points} points "
            f"(SH deg 3) -> {n_points * samples / dt:.0f} point-dirs/s"
        )


if __name__ == "__main__":
    main()
