"""Extract a PlenOctree from a trained NeRF-SH model.

Parity: octree/extraction.py (flags :66-176, main :425-516) with the
torch+svox stack replaced by the native JAX path — reference flax
checkpoints load directly (no --is_jaxnerf_ckpt conversion needed; the flag
is accepted and ignored since checkpoint layout is auto-detected).

Usage:
  python -m octree.extraction \
      --train_dir <ckpt dir> --config nerf_sh/config/blender \
      --data_dir <scene dir> --output <tree.npz>
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import os.path as osp

from absl import app, flags
import jax
import numpy as np
from jax import random

from plenoctree_tpu import engine
from plenoctree_tpu.data import get_dataset
from plenoctree_tpu.models import get_model_state
from plenoctree_tpu.octree import N3Tree
from plenoctree_tpu.octree import extract as extract_lib
from plenoctree_tpu.parallel import make_mesh
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils.io import host0_print as h0print

FLAGS = flags.FLAGS

flags.DEFINE_string("output", "./tree.npz", "Output file")
flags.DEFINE_bool("eval", True, "Evaluate after building the octree")
config_lib.define_flags()


def main(unused_argv):
    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS)
    cfg = config_lib.flags_to_namespace(FLAGS)

    h0print("* Loading NeRF")
    rng = random.PRNGKey(20200823)
    model, state = get_model_state(rng, cfg, restore=True)
    variables = jax.device_get(state.variables)
    h0print("  from step", int(state.step))

    data_format = None
    extra_data = None
    if cfg.sg_dim > 0:
        data_format = f"SG{cfg.sg_dim}"
        # Bake softplus(lambda) and cartesian mu so the renderer/viewer need
        # no activation (parity: octree/extraction.py:436-442).
        sg_lambda = np.asarray(variables["params"]["sg_lambda"])
        sg_mu = np.asarray(variables["params"]["sg_mu_spher"])
        lam = np.logaddexp(0.0, sg_lambda)  # softplus
        mu = np.stack(
            [
                np.sin(sg_mu[:, 0]) * np.cos(sg_mu[:, 1]),
                np.sin(sg_mu[:, 0]) * np.sin(sg_mu[:, 1]),
                np.cos(sg_mu[:, 0]),
            ],
            axis=-1,
        )
        extra_data = np.concatenate([lam[:, None], mu], axis=-1).astype(np.float32)
    elif cfg.sh_deg > 0:
        data_format = f"SH{(cfg.sh_deg + 1) ** 2}"
    if data_format is not None:
        h0print("Detected format:", data_format)

    base_dir = osp.dirname(FLAGS.output)
    if base_dir:
        os.makedirs(base_dir, exist_ok=True)

    assert cfg.data_dir, "data_dir is required"
    dataset = get_dataset("train", cfg, prefetch=False)

    if cfg.bbox_from_data:
        assert dataset.bbox is not None, "dataset must provide bbox (NSVF)"
        center = (dataset.bbox[:3] + dataset.bbox[3:6]) * 0.5
        radius = (dataset.bbox[3:6] - dataset.bbox[:3]) * 0.5 * cfg.data_bbox_scale
        h0print("Bounding box from data: c", center, "r", radius)
    else:
        center = list(map(float, cfg.center.split()))
        if len(center) == 1:
            center *= 3
        radius = list(map(float, cfg.radius.split()))
        if len(radius) == 1:
            radius *= 3

    mesh = make_mesh(cfg.mesh_shape)
    points_fn_jit = engine.make_eval_points_fn(model, raw_rgb=True)
    points_fn = lambda p, v: points_fn_jit(variables, p, v)
    if cfg.use_viewdirs:
        cross_jit = jax.jit(
            lambda p, d: model.apply(variables, p, d, method=model.eval_points_cross)
        )
        points_fn_cross = lambda p, d: jax.device_get(cross_jit(p, d))
    else:
        points_fn_cross = None

    if cfg.autoscale:
        center, radius = extract_lib.auto_scale(cfg, center, radius, points_fn, mesh)
        h0print("Autoscale result center", center, "radius", radius)

    radius = [r * cfg.bbox_scale for r in radius]
    if cfg.bbox_cube:
        radius = [max(radius)] * 3

    num_rgb_channels = cfg.num_rgb_channels
    if cfg.sh_deg >= 0:
        assert cfg.sg_dim == -1
        num_rgb_channels *= (cfg.sh_deg + 1) ** 2
    elif cfg.sg_dim > 0:
        assert cfg.sh_deg == -1
        num_rgb_channels *= cfg.sg_dim
    data_dim = 1 + num_rgb_channels
    h0print("data dim is", data_dim)

    if cfg.tree_branch_n != 2:
        # The tree/renderer stack is N-generic (octree/n3tree.py), but the
        # extraction grid math is base-2 — exactly like the reference, whose
        # own dense grid hardcodes 2**(init_grid_depth+1) even though it
        # exposes --tree_branch_n (octree/extraction.py:100-110,246,290).
        raise app.UsageError(
            "--tree_branch_n != 2 is not supported by extraction (the dense "
            "evaluation grid is base-2, as in the reference). N != 2 trees "
            "built elsewhere can still be optimized/evaluated/compressed."
        )
    h0print("* Creating model")
    tree = N3Tree(
        N=cfg.tree_branch_n,
        data_dim=data_dim,
        init_reserve=500000,
        depth_limit=cfg.init_grid_depth,
        radius=radius,
        center=center,
        data_format=data_format,
        extra_data=extra_data,
    )

    extract_lib.step1_build(cfg, tree, points_fn, dataset, mesh)
    extract_lib.step2_fill(cfg, tree, points_fn, points_fn_cross, mesh)
    tree.relu_sigma_()
    tree.shrink_to_fit()
    h0print(tree)

    h0print("* Saving", FLAGS.output)
    tree.save(FLAGS.output, compress=False)

    if FLAGS.eval:
        import json

        from plenoctree_tpu.octree.evaluate import eval_octree

        dataset = get_dataset("test", cfg, prefetch=False)
        h0print("* Evaluation (before fine tune)")
        avg_psnr, avg_ssim, avg_lpips, _ = eval_octree(
            tree, dataset, cfg, want_lpips=True
        )
        print("Average PSNR", avg_psnr, "SSIM", avg_ssim, "LPIPS", avg_lpips)
        with open(FLAGS.output + ".results.json", "w") as f:
            json.dump(
                {
                    "psnr": avg_psnr,
                    "ssim": avg_ssim,
                    "lpips": avg_lpips,
                    "capacity": int(tree.n_internal),
                    "n_leaves": int(tree.n_leaves),
                },
                f,
            )


if __name__ == "__main__":
    app.run(main)
