"""Time each extraction phase (auto_scale / step1 / step2 / eval) on chip.

Usage: python scripts/probe_extract_phases.py [--train_dir /tmp/vtrain ...]
Writes nothing; prints per-phase wall-clock so the conversion-speed work
(VERDICT r2 item 4) has a measured breakdown.
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys

sys.argv = [sys.argv[0]]

from absl import flags
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

FLAGS = flags.FLAGS
config_lib.define_flags()
FLAGS(
    [
        "probe",
        "--train_dir", os.environ.get("PX_TRAIN", "/tmp/vtrain"),
        "--data_dir", os.environ.get("PX_DATA", "/tmp/synth_scene"),
        "--dataset", "blender",
        "--num_coarse_samples", "16",
        "--num_fine_samples", "16",
        "--net_depth", "3",
        "--net_width", "48",
        "--sh_deg", "1",
        "--nouse_viewdirs",
        "--factor", "0",
        "--init_grid_depth", os.environ.get("PX_DEPTH", "6"),
        "--samples_per_cell", "8",
        "--chunk", os.environ.get("PX_CHUNK", "8192"),
    ]
)
config_lib.update_flags(FLAGS)
cfg = config_lib.flags_to_namespace(FLAGS)

T0 = time.time()


def tick(msg, t0):
    print(f"[{time.time()-T0:7.1f}s] {msg}: {time.time()-t0:.1f}s", flush=True)


t0 = time.time()
rng = random.PRNGKey(20200823)
model, state = get_model_state(rng, cfg, restore=True)
variables = jax.device_get(state.variables)
dataset = get_dataset("train", cfg, prefetch=False)
mesh = make_mesh(cfg.mesh_shape)
points_fn_jit = engine.make_eval_points_fn(model, raw_rgb=True)
points_fn = lambda p, v: points_fn_jit(variables, p, v)
tick("load", t0)

center = [0.0, 0.0, 0.0]
radius = [1.5, 1.5, 1.5]
t0 = time.time()
center, radius = extract_lib.auto_scale(cfg, center, radius, points_fn, mesh)
tick("auto_scale", t0)

tree = N3Tree(
    N=2,
    data_dim=1 + 3 * (cfg.sh_deg + 1) ** 2,
    init_reserve=500000,
    depth_limit=cfg.init_grid_depth,
    radius=[r * cfg.bbox_scale for r in radius],
    center=center,
    data_format=f"SH{(cfg.sh_deg + 1) ** 2}",
)

t0 = time.time()
extract_lib.step1_build(cfg, tree, points_fn, dataset, mesh)
tick("step1_build", t0)

t0 = time.time()
extract_lib.step2_fill(cfg, tree, points_fn, None, mesh)
tick("step2_fill", t0)

t0 = time.time()
tree.relu_sigma_()
tree.shrink_to_fit()
tree.save("/tmp/probe_tree.npz", compress=False)
tick("save", t0)
print(tree)
