"""Render a spherical-orbit video from a trained NeRF-SH model.

Parity: nerf_sh/gen_video.py — same flag surface (elevation/num_views/
height/width/camera_angle_x/intrin/radius/fps/up_axis/write_poses), same
output layout (train_dir/video/e{elev}/frames/*.png + video.mp4), pmap
render loop replaced by the sharded chunked engine.

Usage:
  python -m nerf_sh.gen_video --config nerf_sh/config/blender \
      --train_dir <ckpt dir> [--elevation -30 --num_views 40]
"""

import functools
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from absl import app, flags
import jax
import numpy as np
from jax import random

from plenoctree_tpu import engine
from plenoctree_tpu.data.poses import pose_spherical
from plenoctree_tpu.data.rays import generate_rays
from plenoctree_tpu.models import get_model_state
from plenoctree_tpu.parallel import make_mesh
from plenoctree_tpu.types import namedtuple_map
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils import io as io_utils
from plenoctree_tpu.utils.io import host0_print as h0print

FLAGS = flags.FLAGS

flags.DEFINE_float("elevation", -30.0, "Elevation angle (negative is above)")
flags.DEFINE_integer("num_views", 40, "The number of views to generate.")
flags.DEFINE_integer("height", 800, "The size of images to generate.")
flags.DEFINE_integer("width", 800, "The size of images to generate.")
flags.DEFINE_float(
    "camera_angle_x", 0.7, "Camera angle in rad in x direction (sets focal)."
)
flags.DEFINE_string("intrin", None, "Intrinsics file; overrides camera_angle_x")
flags.DEFINE_float("radius", 4.0, "Radius to origin of camera path.")
flags.DEFINE_integer("fps", 20, "FPS of generated video")
flags.DEFINE_integer(
    "up_axis",
    1,
    "up axis for camera views; 1-6: Z up/Z down/Y up/Y down/X up/X down",
)
flags.DEFINE_string(
    "write_poses", None, "Specify to write poses to given file (4N x 4)"
)
config_lib.define_flags(extra=("radius",))


def main(unused_argv):
    import imageio

    rng = random.PRNGKey(20200823)
    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS, require_data=False)
    cfg = config_lib.flags_to_namespace(FLAGS)

    h0print("* Generating poses")
    render_poses = np.stack(
        [
            pose_spherical(angle, FLAGS.elevation, FLAGS.radius, FLAGS.up_axis - 1)
            for angle in np.linspace(-180, 180, FLAGS.num_views + 1)[:-1]
        ],
        0,
    )
    if FLAGS.write_poses:
        np.savetxt(FLAGS.write_poses, render_poses.reshape(-1, 4))
        print("Saved poses to", FLAGS.write_poses)

    focal = 0.5 * FLAGS.width / np.tan(0.5 * FLAGS.camera_angle_x)
    if FLAGS.intrin is not None:
        h0print("Load focal length from intrin file")
        K = np.loadtxt(FLAGS.intrin)
        focal = (K[0, 0] + K[1, 1]) * 0.5

    h0print("* Generating rays")
    rays = generate_rays(FLAGS.width, FLAGS.height, focal, render_poses)

    h0print("* Creating model")
    rng, key = random.split(rng)
    model, state = get_model_state(key, cfg, restore=True)
    variables = jax.device_get(state.variables)
    mesh = make_mesh(cfg.mesh_shape)
    render_fn = engine.make_render_fn(model, cfg, randomized=False)

    vid_name = "e{:03}".format(int(-FLAGS.elevation * 10))
    video_dir = os.path.join(cfg.train_dir, "video", vid_name)
    frames_dir = os.path.join(video_dir, "frames")
    h0print(" Saving to", video_dir)
    os.makedirs(frames_dir, exist_ok=True)

    frames = []
    for i in range(FLAGS.num_views):
        h0print(f"** View {i + 1}/{FLAGS.num_views}")
        pred_color, _, _ = engine.render_image(
            functools.partial(render_fn, variables),
            namedtuple_map(lambda x: x[i], rays),
            rng,
            normalize_disp=cfg.dataset == "llff",
            chunk=cfg.chunk,
            mesh=mesh,
        )
        if jax.process_index() == 0:
            io_utils.save_img(pred_color, os.path.join(frames_dir, f"{i:04}.png"))
            frames.append(np.asarray(pred_color))

    if jax.process_index() == 0:
        frames = np.stack(frames)
        vid_path = os.path.join(video_dir, "video.mp4")
        print("* Writing video", vid_path)
        try:
            imageio.mimwrite(
                vid_path,
                (np.clip(frames, 0.0, 1.0) * 255).astype(np.uint8),
                fps=FLAGS.fps,
                quality=8,
            )
        except Exception as e:  # no ffmpeg backend in this environment
            print(f"  mp4 write unavailable ({e}); frames kept in {frames_dir}")
        print("* Done")


if __name__ == "__main__":
    app.run(main)
