"""Extract an isosurface mesh from a trained NeRF's density field.

Parity: nerf_sh/gen_mesh.py — same flag surface (reso/c1/c2/iso/coarse/
point_chunk), dense sigma grid eval + isosurface + OBJ to train_dir/mesh.obj,
with pymcubes replaced by the in-repo vectorized marching tetrahedra
(plenoctree_tpu.ops.marching).

Usage:
  python -m nerf_sh.gen_mesh --config nerf_sh/config/blender \
      --train_dir <ckpt dir> [--reso "300 300 300" --iso 6.0]
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

flags.DEFINE_string("reso", "300 300 300", "Marching resolution per dimension: x y z")
flags.DEFINE_string("c1", "-2 -2 -2", "Bounds lower corner x y z OR single number")
flags.DEFINE_string("c2", "2 2 2", "Bounds upper corner x y z OR single number")
flags.DEFINE_float("iso", 6.0, "Isosurface sigma level")
flags.DEFINE_bool("coarse", False, "Force the coarse network")
flags.DEFINE_integer(
    "point_chunk", 720720, "Point batch size for evaluation (--chunk ignored)"
)
config_lib.define_flags()


def main(unused_argv):
    rng = random.PRNGKey(20200823)
    config_lib.update_flags(FLAGS)
    config_lib.check_flags(FLAGS, require_data=False)
    cfg = config_lib.flags_to_namespace(FLAGS)

    reso = list(map(int, FLAGS.reso.split()))
    if len(reso) == 1:
        reso *= 3
    c1 = list(map(float, FLAGS.c1.split()))
    if len(c1) == 1:
        c1 *= 3
    c2 = list(map(float, FLAGS.c2.split()))
    if len(c2) == 1:
        c2 *= 3
    c1, c2 = np.asarray(c1, np.float32), np.asarray(c2, np.float32)

    rng, key = random.split(rng)
    h0print("* Creating model")
    model, state = get_model_state(key, cfg, restore=True)
    variables = jax.device_get(state.variables)
    h0print("* Eval reso", FLAGS.reso, "coarse?", FLAGS.coarse, "step", int(state.step))

    mesh = make_mesh(cfg.mesh_shape)
    points_fn = engine.make_eval_points_fn(model, raw_rgb=True, coarse=FLAGS.coarse)

    axes = [np.linspace(c1[i], c2[i], reso[i], dtype=np.float32) for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    dirs = np.zeros_like(grid) if model.use_viewdirs else None
    _, sigma = engine.eval_points(
        lambda p, v: points_fn(variables, p, v),
        grid,
        dirs,
        chunk=FLAGS.point_chunk,
        mesh=mesh,
    )
    sigma = np.maximum(sigma[..., 0], 0.0).reshape(reso)

    h0print("* Marching tetrahedra at iso", FLAGS.iso)
    verts, tris = marching_tetrahedra(sigma, FLAGS.iso)
    verts = c1 + verts / (np.asarray(reso) - 1) * (c2 - c1)
    h0print(f"  {len(verts)} vertices, {len(tris)} triangles")
    if jax.process_index() == 0:
        mesh_path = os.path.join(cfg.train_dir, "mesh.obj")
        print(" Saving to", mesh_path)
        save_obj(verts, tris, mesh_path)


if __name__ == "__main__":
    app.run(main)
