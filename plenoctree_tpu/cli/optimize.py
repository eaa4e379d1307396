"""Optimize a PlenOctree by fine-tuning on the train set.

Parity: octree/optimization.py — SGD (lr ~1e7) or Adam directly on leaf
data through the differentiable renderer, per-image MSE steps, validation
early stopping (best snapshot kept), optional train-split holdout.

Usage:
  python -m octree.optimization \
      --input <tree.npz> --config nerf_sh/config/blender \
      --data_dir <scene dir> --train_dir <ckpt dir> --output <tree_opt.npz>
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from absl import app, flags
import numpy as np

from plenoctree_tpu.data import get_dataset
from plenoctree_tpu.octree import N3Tree
from plenoctree_tpu.octree.optimize import optimize_tree
from plenoctree_tpu.octree.renderer import make_ndc_config
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils.io import host0_print as h0print

FLAGS = flags.FLAGS

flags.DEFINE_string("input", "./tree.npz", "Input octree npz from extraction")
flags.DEFINE_string("output", "./tree_opt.npz", "Output octree npz")
flags.DEFINE_integer("render_interval", 0, "render interval")
flags.DEFINE_integer("val_interval", 2, "validation interval")
flags.DEFINE_integer("num_epochs", 80, "epochs to train for")
flags.DEFINE_bool("sgd", True, "use SGD optimizer instead of Adam")
flags.DEFINE_float("lr", 1e7, "optimizer step size")
flags.DEFINE_float("sgd_momentum", 0.0, "sgd momentum")
flags.DEFINE_bool("sgd_nesterov", False, "sgd nesterov momentum")
flags.DEFINE_string("write_vid", None, "write rendered video to path (*.mp4)")
flags.DEFINE_bool("split_train", None, "split train set instead of val set")
flags.DEFINE_float("split_holdout_prop", 0.2, "holdout proportion for split_train")
flags.DEFINE_bool("nosave", False, "do not save (for speed)")
flags.DEFINE_bool(
    "continue_on_decrease", False, "keep training even if val PSNR decreases"
)
flags.DEFINE_integer(
    "opt_rays_per_step",
    0,
    "subsample this many rays per optimizer step instead of the full image "
    "(unbiased minibatch; 0 = reference full-image behavior)",
)
flags.DEFINE_bool(
    "tile_opt",
    False,
    "optimize through the Pallas tile-compositing renderer (whole-frame "
    "MXU pipeline) instead of the exact march; not supported for NDC/LLFF",
)
flags.DEFINE_integer(
    "tile_grid_c", 64, "tile optimizer coarse partition resolution"
)
config_lib.define_flags()


def main(unused_argv):
    np.random.seed(20200823)
    config_lib.update_flags(FLAGS)
    cfg = config_lib.flags_to_namespace(FLAGS)

    def get_data(stage):
        dataset = get_dataset(stage, cfg, prefetch=False)
        images = dataset.images.reshape(-1, dataset.h, dataset.w, 3)
        return dataset.focal, dataset.camtoworlds, images

    focal, train_c2w, train_gt = get_data("train")
    if FLAGS.split_train:
        test_sz = int(train_c2w.shape[0] * FLAGS.split_holdout_prop)
        h0print("Splitting train to train/val manually, holdout", test_sz)
        perm = np.random.permutation(train_c2w.shape[0])
        test_c2w, test_gt = train_c2w[perm[:test_sz]], train_gt[perm[:test_sz]]
        train_c2w, train_gt = train_c2w[perm[test_sz:]], train_gt[perm[test_sz:]]
    else:
        h0print("Using given val set")
        test_focal, test_c2w, test_gt = get_data("val")
        assert focal == test_focal
    H, W = train_gt[0].shape[:2]

    h0print("N3Tree load", FLAGS.input)
    tree = N3Tree.load(FLAGS.input)

    ndc = (
        make_ndc_config(W, H, focal)
        if cfg.config is not None and "llff" in str(cfg.config)
        else None
    )

    opt_name = "SGD" if FLAGS.sgd else "Adam"
    h0print(f"Using {opt_name}, lr {FLAGS.lr}")
    if FLAGS.tile_opt and ndc is None:
        from plenoctree_tpu.octree.tile_opt import optimize_tree_tiles

        best_tree, best_psnr = optimize_tree_tiles(
            tree,
            train_c2w,
            train_gt,
            test_c2w,
            test_gt,
            focal,
            cfg,
            num_epochs=FLAGS.num_epochs,
            lr=FLAGS.lr,
            use_sgd=FLAGS.sgd,
            sgd_momentum=FLAGS.sgd_momentum,
            val_interval=FLAGS.val_interval,
            continue_on_decrease=FLAGS.continue_on_decrease,
            grid_c=FLAGS.tile_grid_c,
        )
    else:
        if FLAGS.tile_opt:
            h0print("tile_opt unsupported with NDC; falling back to the march")
        best_tree, best_psnr = optimize_tree(
            tree,
            train_c2w,
            train_gt,
            test_c2w,
            test_gt,
            focal,
            cfg,
            num_epochs=FLAGS.num_epochs,
            lr=FLAGS.lr,
            use_sgd=FLAGS.sgd,
            sgd_momentum=FLAGS.sgd_momentum,
            val_interval=FLAGS.val_interval,
            continue_on_decrease=FLAGS.continue_on_decrease,
            ndc=ndc,
            rays_per_step=FLAGS.opt_rays_per_step,
        )
    if not FLAGS.nosave:
        if best_tree is not None:
            h0print("Saving best model to", FLAGS.output)
            best_tree.save(FLAGS.output, compress=False)
        else:
            h0print("Did not improve upon initial model")


if __name__ == "__main__":
    app.run(main)
