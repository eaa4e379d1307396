"""Extract an isosurface mesh from a trained NeRF's density field.

Parity: nerf_sh/gen_mesh.py — dense sigma grid eval + marching isosurface +
OBJ output, with pymcubes replaced by the in-repo vectorized marching
tetrahedra (plenoctree_tpu.ops.marching).

Usage:
  python -m nerf_sh.gen_mesh --config nerf_sh/config/blender \
      --train_dir <ckpt dir> --output mesh.obj
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from absl import app, flags
import jax
import numpy as np
from jax import random

from plenoctree_tpu import engine
from plenoctree_tpu.models import get_model_state
from plenoctree_tpu.ops.marching import marching_tetrahedra, save_obj
from plenoctree_tpu.parallel import make_mesh
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils.io import host0_print as h0print

FLAGS = flags.FLAGS

flags.DEFINE_string("output", "mesh.obj", "output OBJ path")
flags.DEFINE_integer("reso", 256, "marching grid resolution")
flags.DEFINE_float("iso", 10.0, "sigma isosurface level")
flags.DEFINE_string("c1", "-1 -1 -1", "low corner of the sample cube")
flags.DEFINE_string("c2", "1 1 1", "high corner of the sample cube")
config_lib.define_flags()


def main(unused_argv):
    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS, require_data=False)
    cfg = config_lib.flags_to_namespace(FLAGS)

    rng = random.PRNGKey(20200823)
    rng, key = random.split(rng)
    model, state = get_model_state(key, cfg, restore=True)
    variables = jax.device_get(state.variables)
    h0print("* Generating mesh from step", int(state.step))

    mesh = make_mesh(cfg.mesh_shape)
    points_fn = engine.make_eval_points_fn(model, raw_rgb=True)

    c1 = np.array(list(map(float, FLAGS.c1.split())), dtype=np.float32)
    c2 = np.array(list(map(float, FLAGS.c2.split())), dtype=np.float32)
    reso = FLAGS.reso
    arr = [np.linspace(c1[i], c2[i], reso, dtype=np.float32) for i in range(3)]
    grid = np.stack(np.meshgrid(*arr, indexing="ij"), axis=-1).reshape(-1, 3)

    if model.use_viewdirs:
        dirs = np.zeros_like(grid)
    else:
        dirs = None
    _, sigma = engine.eval_points(
        lambda p, v: points_fn(variables, p, v), grid, dirs, chunk=cfg.chunk, mesh=mesh
    )
    sigma = np.maximum(sigma[..., 0], 0.0).reshape(reso, reso, reso)

    h0print("* Marching tetrahedra at iso", FLAGS.iso)
    verts, tris = marching_tetrahedra(sigma, FLAGS.iso)
    # Index coords -> world coords.
    verts = c1 + verts / (reso - 1) * (c2 - c1)
    h0print(f"  {len(verts)} vertices, {len(tris)} triangles")
    if jax.process_index() == 0:
        save_obj(verts, tris, FLAGS.output)
        h0print("* Saved to", FLAGS.output)


if __name__ == "__main__":
    app.run(main)
