"""NeRF-SH evaluation CLI: chunked full-image test renders + PSNR/SSIM.

Parity: nerf_sh/eval.py — including the poll-for-new-checkpoints mode
(eval_once=False) and per-image output saving.

Usage:
  python -m nerf_sh.eval --config nerf_sh/config/blender \
      --data_dir <scene dir> --train_dir <ckpt dir> --chunk 4096
"""

import functools
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
from plenoctree_tpu.parallel import make_mesh
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils import io as io_utils
from plenoctree_tpu.utils.io import host0_print as h0print
from plenoctree_tpu.utils.metrics_writer import MetricsWriter

FLAGS = flags.FLAGS
config_lib.define_flags()


def main(unused_argv):
    rng = random.PRNGKey(20200823)
    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS)
    cfg = config_lib.flags_to_namespace(FLAGS)

    dataset = get_dataset("test", cfg)
    rng, key = random.split(rng)
    model, _ = get_model_state(key, cfg, restore=False)
    mesh = make_mesh(cfg.mesh_shape)
    render_fn = engine.make_render_fn(model, cfg, randomized=False)

    last_step = 0
    out_dir = os.path.join(
        cfg.train_dir, "path_renders" if cfg.render_path else "test_preds"
    )
    if cfg.save_output:
        os.makedirs(out_dir, exist_ok=True)
    writer = (
        MetricsWriter(os.path.join(cfg.train_dir, "eval"))
        if jax.process_index() == 0
        else None
    )
    while True:
        _, state = get_model_state(key, cfg, restore=True)
        step = int(state.step)
        if step <= last_step and not cfg.eval_once:
            time.sleep(10)
            continue
        variables = jax.device_get(state.variables)
        psnr_values = []
        ssim_values = []
        for idx in range(dataset.size):
            case = next(dataset)
            if idx % cfg.approx_eval_skip != 0:
                continue
            h0print(f"Evaluating {idx + 1}/{dataset.size}")
            pred_color, pred_disp, pred_acc = engine.render_image(
                functools.partial(render_fn, variables),
                case["rays"],
                rng,
                normalize_disp=cfg.dataset == "llff",
                chunk=cfg.chunk,
                mesh=mesh,
            )
            if jax.process_index() != 0:
                continue
            if not cfg.render_path:
                psnr = float(compute_psnr(np.mean((pred_color - case["pixels"]) ** 2)))
                ssim = float(compute_ssim(pred_color, case["pixels"], max_val=1.0))
                h0print(f"  PSNR = {psnr:.4f}, SSIM = {ssim:.4f}")
                psnr_values.append(psnr)
                ssim_values.append(ssim)
            if cfg.save_output:
                io_utils.save_img(pred_color, os.path.join(out_dir, f"{idx:03d}.png"))
                io_utils.save_img(
                    pred_disp[..., 0], os.path.join(out_dir, f"disp_{idx:03d}.png")
                )
        if jax.process_index() == 0 and not cfg.render_path:
            avg_psnr = float(np.mean(psnr_values))
            avg_ssim = float(np.mean(ssim_values))
            writer.scalar("eval_psnr", avg_psnr, step)
            writer.scalar("eval_ssim", avg_ssim, step)
            with open(os.path.join(cfg.train_dir, "psnr.txt"), "w") as f:
                f.write(f"{avg_psnr}")
            with open(os.path.join(cfg.train_dir, "ssim.txt"), "w") as f:
                f.write(f"{avg_ssim}")
            print(f"Average over {len(psnr_values)} images: PSNR {avg_psnr:.4f} SSIM {avg_ssim:.4f}")
        if cfg.eval_once:
            break
        if step >= cfg.max_steps:
            break
        last_step = step


if __name__ == "__main__":
    app.run(main)
