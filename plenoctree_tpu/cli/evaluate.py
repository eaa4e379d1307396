"""Evaluate a PlenOctree on the test set.

Parity: octree/evaluation.py — render all test views from the tree, report
PSNR/SSIM/LPIPS, optionally write video/images.

Usage:
  python -m octree.evaluation --input <tree_opt.npz> \
      --config nerf_sh/config/blender --data_dir <scene dir>
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from absl import app, flags
import numpy as np

from plenoctree_tpu.data import get_dataset
from plenoctree_tpu.octree import N3Tree
from plenoctree_tpu.octree.evaluate import eval_octree
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils.io import host0_print as h0print

FLAGS = flags.FLAGS

flags.DEFINE_string("input", "./tree_opt.npz", "Input octree npz")
flags.DEFINE_string("write_vid", None, "write rendered video (*.mp4)")
flags.DEFINE_string("write_images", None, "write images to directory")
config_lib.define_flags()


def main(unused_argv):
    np.random.seed(20200823)
    config_lib.update_flags(FLAGS)
    cfg = config_lib.flags_to_namespace(FLAGS)

    dataset = get_dataset("test", cfg, prefetch=False)
    h0print("N3Tree load", FLAGS.input)
    tree = N3Tree.load(FLAGS.input)

    want_frames = FLAGS.write_vid is not None or FLAGS.write_images is not None
    avg_psnr, avg_ssim, avg_lpips, frames = eval_octree(
        tree, dataset, cfg, want_lpips=True, want_frames=want_frames
    )
    print("Average PSNR", avg_psnr, "SSIM", avg_ssim, "LPIPS", avg_lpips)
    import json

    with open(FLAGS.input + ".results.json", "w") as f:
        json.dump({"psnr": avg_psnr, "ssim": avg_ssim, "lpips": avg_lpips}, f)

    if FLAGS.write_vid is not None and len(frames):
        import imageio

        h0print("Writing to", FLAGS.write_vid)
        try:
            imageio.mimwrite(FLAGS.write_vid, frames)
        except Exception as e:  # no ffmpeg backend in this environment
            h0print(f"  mp4 write unavailable ({e}); use --write_images instead")
    if FLAGS.write_images is not None and len(frames):
        import imageio

        h0print("Writing to", FLAGS.write_images)
        os.makedirs(FLAGS.write_images, exist_ok=True)
        for idx, frame in enumerate(frames):
            imageio.imwrite(os.path.join(FLAGS.write_images, f"{idx:03d}.png"), frame)


if __name__ == "__main__":
    app.run(main)
