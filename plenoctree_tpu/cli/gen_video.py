"""Render a spherical-orbit video from a trained NeRF-SH model.

Parity: nerf_sh/gen_video.py — orbit pose generation + chunked renders +
mp4 via imageio.

Usage:
  python -m nerf_sh.gen_video --config nerf_sh/config/blender \
      --data_dir <scene> --train_dir <ckpt dir> --output video.mp4
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
from plenoctree_tpu.utils.io import host0_print as h0print

FLAGS = flags.FLAGS

flags.DEFINE_string("output", "video.mp4", "output video path (*.mp4)")
flags.DEFINE_integer("num_views", 40, "number of orbit views")
flags.DEFINE_float("elevation", -30.0, "orbit elevation in degrees")
flags.DEFINE_float("radius", 4.0, "orbit camera radius")
flags.DEFINE_integer("height", 800, "output image height")
flags.DEFINE_integer("width", 800, "output image width")
flags.DEFINE_float("fps", 30.0, "output video fps")
flags.DEFINE_float("camera_angle_x", 0.6911112070083618, "horizontal FOV (rad)")
flags.DEFINE_integer("up_axis", 0, "up axis remap (see pose_spherical)")
config_lib.define_flags()


def main(unused_argv):
    import imageio

    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS, require_data=False)
    cfg = config_lib.flags_to_namespace(FLAGS)

    rng = random.PRNGKey(20200823)
    rng, key = random.split(rng)
    model, state = get_model_state(key, cfg, restore=True)
    variables = jax.device_get(state.variables)
    h0print("* Rendering from step", int(state.step))

    mesh = make_mesh(cfg.mesh_shape)
    render_fn = engine.make_render_fn(model, cfg, randomized=False)

    focal = 0.5 * FLAGS.width / np.tan(0.5 * FLAGS.camera_angle_x)
    thetas = np.linspace(-180.0, 180.0, FLAGS.num_views, endpoint=False)
    c2ws = np.stack(
        [
            pose_spherical(th, FLAGS.elevation, FLAGS.radius, FLAGS.up_axis)
            for th in thetas
        ],
        axis=0,
    )
    frames = []
    for i, c2w in enumerate(c2ws):
        h0print(f" View {i + 1}/{len(c2ws)}")
        rays = generate_rays(FLAGS.width, FLAGS.height, focal, c2w[None])
        rays = namedtuple_map(lambda r: r[0], rays)
        rgb, _, _ = engine.render_image(
            functools.partial(render_fn, variables),
            rays,
            rng,
            normalize_disp=False,
            chunk=cfg.chunk,
            mesh=mesh,
        )
        frames.append((np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8))

    if jax.process_index() == 0:
        h0print("* Writing", FLAGS.output)
        imageio.mimwrite(FLAGS.output, frames, fps=FLAGS.fps, quality=8)


if __name__ == "__main__":
    app.run(main)
