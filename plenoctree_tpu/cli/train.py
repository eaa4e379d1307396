"""NeRF-SH training CLI.

Parity: nerf_sh/train.py — pmap loop replaced by a jit-over-Mesh step
(state replicated, ray batch sharded on the "data" ICI axis), TensorBoard
scalars + rays/sec counters, periodic checkpoints + test-view renders,
timings.txt wall-clock log.

Usage:
  python -m nerf_sh.train --config nerf_sh/config/blender \
      --data_dir <scene dir> --train_dir <ckpt dir>
"""

import functools
import gc
import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from absl import app, flags
import jax
import numpy as np
from jax import random

from plenoctree_tpu import engine
from plenoctree_tpu.data import get_dataset
from plenoctree_tpu.models import get_model_state
from plenoctree_tpu.ops.metrics import compute_psnr, compute_ssim
from plenoctree_tpu.parallel import (
    make_mesh,
    prefetch_to_device,
    replicate_pytree,
)
from plenoctree_tpu.utils import checkpoints as ckpt_utils
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils import io as io_utils
from plenoctree_tpu.utils.io import host0_print as h0print
from plenoctree_tpu.utils.lr import schedule_from_config
from plenoctree_tpu.utils.metrics_writer import MetricsWriter

FLAGS = flags.FLAGS
config_lib.define_flags()


def main(unused_argv):
    # Multi-host pods: establish the jax distributed runtime before any
    # device use (the reference relied on pmap's implicit multi-host setup;
    # pjit over a global mesh needs explicit initialization).
    if os.environ.get("PLENOCTREE_DISTRIBUTED"):
        jax.distributed.initialize()

    rng = random.PRNGKey(20200823)
    np.random.seed(20201473 + jax.process_index())

    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS)
    cfg = config_lib.flags_to_namespace(FLAGS)

    os.makedirs(cfg.train_dir, exist_ok=True)
    render_dir = os.path.join(cfg.train_dir, "render")
    os.makedirs(render_dir, exist_ok=True)

    timings = io_utils.TimingsLog(os.path.join(cfg.train_dir, "timings.txt"))
    timings.write(0)

    h0print("* Load train data")
    dataset = get_dataset("train", cfg)
    h0print("* Load test data")
    test_dataset = get_dataset("test", cfg)

    h0print("* Load model")
    rng, key = random.split(rng)
    model, state = get_model_state(key, cfg, restore=True)
    init_step = int(state.step) + 1

    mesh = make_mesh(cfg.mesh_shape)
    h0print(f"* Mesh: {dict(mesh.shape)}")
    state = replicate_pytree(state, mesh)
    train_step = engine.make_train_step(model, cfg, mesh)
    render_fn = engine.make_render_fn(model, cfg, randomized=cfg.randomized)
    lr_fn = schedule_from_config(cfg)

    writer = MetricsWriter(cfg.train_dir) if jax.process_index() == 0 else None

    # Per-host RNG decorrelation; per-step keys come from fold_in(step).
    rng = random.fold_in(rng, jax.process_index())

    gc.disable()
    stats_trace = []
    reset_timer = True
    batches = prefetch_to_device(dataset, mesh)
    for step, batch in zip(range(init_step, cfg.max_steps + 1), batches):
        if reset_timer:
            t_loop_start = time.time()
            reset_timer = False
        if cfg.profile_start_step and step == cfg.profile_start_step:
            jax.profiler.start_trace(os.path.join(cfg.train_dir, "profile"))
        state, stats, lr = train_step(state, batch, rng)
        if (
            cfg.profile_start_step
            and step == cfg.profile_start_step + cfg.profile_steps
        ):
            jax.block_until_ready(stats.loss)
            jax.profiler.stop_trace()
            h0print("* Profile written to", os.path.join(cfg.train_dir, "profile"))
        if jax.process_index() == 0:
            stats_trace.append(jax.device_get(stats))
        if step % cfg.gc_every == 0:
            gc.collect()

        if jax.process_index() == 0 and step % cfg.print_every == 0:
            stats = jax.device_get(stats)
            lr = float(lr_fn(step))
            writer.scalar("train_loss", stats.loss, step)
            writer.scalar("train_psnr", stats.psnr, step)
            writer.scalar("train_loss_coarse", stats.loss_c, step)
            writer.scalar("train_psnr_coarse", stats.psnr_c, step)
            if cfg.sparsity_weight > 0.0:
                writer.scalar("train_sparse_loss", stats.loss_sp, step)
            writer.scalar("weight_l2", stats.weight_l2, step)
            avg_loss = float(np.mean([s.loss for s in stats_trace]))
            avg_psnr = float(np.mean([s.psnr for s in stats_trace]))
            stats_trace = []
            writer.scalar("train_avg_loss", avg_loss, step)
            writer.scalar("train_avg_psnr", avg_psnr, step)
            writer.scalar("learning_rate", lr, step)
            steps_per_sec = cfg.print_every / (time.time() - t_loop_start)
            reset_timer = True
            rays_per_sec = cfg.batch_size * steps_per_sec
            writer.scalar("train_steps_per_sec", steps_per_sec, step)
            writer.scalar("train_rays_per_sec", rays_per_sec, step)
            precision = int(np.ceil(np.log10(cfg.max_steps))) + 1
            print(
                ("{:" + "{:d}".format(precision) + "d}").format(step)
                + f"/{cfg.max_steps:d}: "
                + f"i_loss={float(stats.loss):0.4f}, "
                + f"avg_loss={avg_loss:0.4f}, "
                + f"weight_l2={float(stats.weight_l2):0.2e}, "
                + f"lr={lr:0.2e}, "
                + f"{rays_per_sec:0.0f} rays/sec"
            )
        if jax.process_index() == 0 and step % cfg.save_every == 0:
            h0print("* Saving")
            ckpt_utils.save_checkpoint(cfg.train_dir, state, step)

        if cfg.render_every > 0 and step % cfg.render_every == 0:
            h0print("\n* Rendering")
            t_eval_start = time.time()
            variables = jax.device_get(state.variables)
            test_case = next(test_dataset)
            pred_color, pred_disp, pred_acc = engine.render_image(
                functools.partial(render_fn, variables),
                test_case["rays"],
                rng,
                normalize_disp=cfg.dataset == "llff",
                chunk=cfg.chunk,
                mesh=mesh,
                # The in-train render uses randomized sampling, so the
                # permutation canary cannot apply (keys are row-indexed).
                verify_backend=not cfg.randomized,
            )
            if jax.process_index() == 0:
                timings.write(step)
                psnr = float(
                    compute_psnr(float(np.mean((pred_color - test_case["pixels"]) ** 2)))
                )
                ssim = float(compute_ssim(pred_color, test_case["pixels"], max_val=1.0))
                eval_time = time.time() - t_eval_start
                num_rays = int(np.prod(test_case["rays"].directions.shape[:-1]))
                rays_per_sec = num_rays / eval_time
                writer.scalar("test_rays_per_sec", rays_per_sec, step)
                print(f"Eval {step}: {eval_time:0.3f}s., {rays_per_sec:0.0f} rays/sec")
                writer.scalar("test_psnr", psnr, step)
                writer.scalar("test_ssim", ssim, step)
                vis = np.hstack(
                    [
                        test_case["pixels"],
                        pred_color,
                        np.repeat(pred_disp, 3, axis=-1),
                        np.repeat(pred_acc, 3, axis=-1),
                    ]
                )
                out_path = os.path.join(render_dir, "{:010}.png".format(step))
                io_utils.save_img(vis, out_path)
                print(" Rendering saved to ", out_path)

    if cfg.max_steps % cfg.save_every != 0 and jax.process_index() == 0:
        ckpt_utils.save_checkpoint(cfg.train_dir, state, cfg.max_steps)


if __name__ == "__main__":
    app.run(main)
