"""Single config/flag system for the whole framework.

The reference maintained two diverging absl-flag surfaces
(nerf_sh/nerf/utils.py:61-230 and octree/nerf/utils.py:44-219); here there is
exactly one. Flags may be overridden from YAML config files by name with
strict unknown-key rejection (parity: update_flags, nerf_sh/nerf/utils.py:233-244).

Use `define_flags()` from absl CLIs, or `default_config()` to get a plain
mutable namespace for programmatic/test use without absl.
"""

import copy
from os import path
import types

import yaml

# name -> (default, help). Order groups: paths, dataset, model, train, eval,
# octree renderer. `enum` entries carry their allowed values.
_FLAG_DEFS = {}


def _flag(name, default, help_str, enum=None):
    _FLAG_DEFS[name] = (default, help_str, enum)


# Paths / config
_flag("train_dir", None, "where to store ckpts and logs")
_flag("data_dir", None, "input data directory")
_flag("config", None, "YAML config file overriding flag values by name")

# Dataset
_flag("dataset", "blender", "dataset loader type", enum=["blender", "llff", "nsvf", "synthetic"])
_flag("image_batching", False, "sample rays in a batch from different images")
_flag("white_bkgd", True, "composite onto white background (blender/nsvf)")
_flag("batch_size", 1024, "number of rays per training mini-batch (global)")
_flag("factor", 4, "image downsample factor, 0 for none")
_flag("spherify", False, "set for spherical 360 scenes (llff)")
_flag("render_path", False, "render generated path (llff only)")
_flag("llffhold", 8, "hold out every 1/N images as llff test set")

# Model
_flag("model", "nerf", "name of the model to use")
_flag("near", 2.0, "near clip of volumetric rendering")
_flag("far", 6.0, "far clip of volumetric rendering")
_flag("net_depth", 8, "depth of the trunk MLP")
_flag("net_width", 256, "width of the trunk MLP")
_flag("net_depth_condition", 1, "depth of the view-conditioned branch")
_flag("net_width_condition", 128, "width of the view-conditioned branch")
_flag("weight_decay_mult", 0.0, "weight decay multiplier")
_flag("skip_layer", 4, "skip connection every N trunk layers")
_flag("num_rgb_channels", 3, "number of color channels")
_flag("num_sigma_channels", 1, "number of density channels")
_flag("randomized", True, "use randomized stratified sampling")
_flag("min_deg_point", 0, "min posenc degree for points")
_flag("max_deg_point", 10, "max posenc degree for points")
_flag("deg_view", 4, "posenc degree for view directions")
_flag("num_coarse_samples", 64, "samples per ray, coarse pass")
_flag("num_fine_samples", 128, "samples per ray, fine pass")
_flag("use_viewdirs", True, "condition colors on view direction")
_flag("sh_deg", -1, "SH output up to given degree; -1 disables")
_flag("sg_dim", -1, "spherical-gaussian output dimension; -1 disables")
_flag("sg_global", True, "share SG lambda/mu globally across points")
_flag("noise_std", None, "std of density regularization noise")
_flag("lindisp", False, "sample linearly in disparity rather than depth")
_flag("net_activation", "relu", "MLP activation name")
_flag("rgb_activation", "sigmoid", "output color activation name")
_flag("sigma_activation", "relu", "output density activation name")
_flag("legacy_posenc_order", False, "legacy TF posenc feature ordering")

# Train
_flag("lr_init", 5e-4, "initial learning rate")
_flag("lr_final", 5e-6, "final learning rate")
_flag("lr_delay_steps", 0, "steps to delay full learning rate")
_flag("lr_delay_mult", 1.0, "lr multiplier during the delay window")
_flag("max_steps", 1000000, "number of optimization steps")
_flag("save_every", 10000, "steps between checkpoints")
_flag("print_every", 1000, "steps between metric reports")
_flag("render_every", 20000, "steps between test-view renders")
_flag("gc_every", 5000, "steps between manual gc passes")
_flag("sparsity_weight", 1e-3, "sparsity loss weight")
_flag("sparsity_length", 0.05, "sparsity loss alpha length")
_flag("sparsity_npoints", 10000, "number of sparsity-loss sample points")
_flag("sparsity_radius", 1.5, "sparsity sampling box half side length")

# Eval
_flag("eval_once", True, "evaluate once vs. poll for new checkpoints")
_flag("save_output", True, "save predicted images to disk")
_flag("chunk", 8192, "rays/points per inference chunk")
_flag("approx_eval_skip", 1, "evaluate every x-th test image only")

# Octree renderer
_flag("renderer_step_size", 1e-4, "octree render step epsilon (1e-3 fast / 1e-5 high)")
_flag("no_early_stop", False, "disable early ray termination in octree render")
_flag("max_segments", 0, "octree march segment bound (0 = auto, 3*2^depth)")
_flag(
    "fast_eval",
    False,
    "evaluate octrees with the Pallas tile renderer (serving path; hit "
    "ordering within a 128-row chunk is mean-direction approximate) instead "
    "of the exact march oracle",
)
_flag(
    "shard_devices",
    0,
    "with --fast_eval: shard the tile renderer over this many devices "
    "(1-axis jax Mesh; 0/1 = single device)",
)

# Octree extraction (parity: octree/extraction.py:66-176)
_flag("center", "0 0 0", "volume center 'x y z' or single number")
_flag("radius", "1.5", "volume 1/2 side length, 'x y z' or single number")
_flag("alpha_thresh", 0.01, "alpha threshold for sigma masking")
_flag("max_refine_prop", 0.5, "max proportion of cells to refine")
_flag("z_min", None, "discard points below this z (NDC use)")
_flag("z_max", None, "discard points above this z (NDC use)")
_flag("tree_branch_n", 2, "tree branch factor (2 = octree)")
_flag("init_grid_depth", 8, "initial grid depth (2^(x+1) voxel grid)")
_flag("samples_per_cell", 8, "3D antialiasing samples per leaf")
_flag("is_jaxnerf_ckpt", False, "checkpoint is original JaxNeRF layout (auto-detected; kept for CLI parity)")
_flag("masking_mode", "weight", "octree build mask source", enum=["sigma", "weight"])
_flag("weight_thresh", 0.001, "weight threshold to keep a voxel")
_flag("projection_samples", 10000, "rays sampled for SH projection")
_flag("bbox_from_data", False, "use dataset bounding box (NSVF bbox.txt)")
_flag("data_bbox_scale", 1.0, "scale factor on the dataset bbox")
_flag("autoscale", False, "auto-scale bbox to sigma support")
_flag("bbox_cube", False, "force the bbox to a cube")
_flag("bbox_scale", 1.0, "final scale factor on the bbox")
_flag("scale_alpha_thresh", 0.01, "alpha threshold during autoscale")
_flag(
    "point_chunk",
    0,
    "points per extraction device dispatch (0 = auto: max(chunk, 131072); "
    "large chunks amortize dispatch latency on remote/tunneled runtimes)",
)

# Profiling (TPU-native replacement for the reference's wall-clock-only
# timings, SURVEY.md §5)
_flag("profile_start_step", 0, "step to start a jax.profiler trace (0 = off)")
_flag("profile_steps", 5, "number of steps to trace")

# Parallelism (TPU-native additions; default = pure data parallel)
_flag("mesh_shape", "", "comma ints: mesh axis sizes (data[,model]); empty = all-data")
_flag("param_dtype", "float32", "parameter dtype")
_flag("compute_dtype", "float32", "activation compute dtype (float32|bfloat16)")
_flag("use_pallas", False, "use Pallas fused kernels where available")


def default_config(**overrides):
    """A mutable flag namespace with all defaults, for tests/library use."""
    cfg = types.SimpleNamespace(**{k: copy.copy(v[0]) for k, v in _FLAG_DEFS.items()})
    for k, v in overrides.items():
        if k not in _FLAG_DEFS:
            raise ValueError(f"Unknown config key: {k}")
        setattr(cfg, k, v)
    return cfg


def define_flags(extra=()):
    """Register all framework flags with absl. `extra` names are skipped
    (lets a CLI define its own versions first)."""
    from absl import flags

    for name, (default, help_str, enum) in _FLAG_DEFS.items():
        if name in extra or name in flags.FLAGS:
            continue
        if enum is not None:
            flags.DEFINE_enum(name, default, enum, help_str)
        elif isinstance(default, bool):
            flags.DEFINE_bool(name, default, help_str)
        elif isinstance(default, int):
            flags.DEFINE_integer(name, default, help_str)
        elif isinstance(default, float) or name in ("noise_std", "z_min", "z_max"):
            flags.DEFINE_float(name, default, help_str)
        else:
            flags.DEFINE_string(name, default, help_str)


def update_flags(args):
    """Merge the YAML file named by args.config into args.

    Unknown keys raise, matching the reference's strict validation
    (nerf_sh/nerf/utils.py:241-243). Accepts both bare and .yaml paths.
    """
    if getattr(args, "config", None) is None:
        return args
    pth = args.config
    if not pth.endswith(".yaml"):
        pth = pth + ".yaml"
    with open(path.expanduser(pth), "r") as fin:
        configs = yaml.load(fin, Loader=yaml.FullLoader)
    invalid = [k for k in configs if not hasattr(args, k) and k not in _FLAG_DEFS]
    if invalid:
        raise ValueError(f"Invalid args {invalid} in {pth}.")
    for k, v in configs.items():
        setattr(args, k, v)
    return args


def check_flags(args, require_data=True):
    """Validate required flags (parity: nerf_sh/nerf/utils.py:247-253)."""
    if args.train_dir is None:
        raise ValueError("train_dir must be set. None set now.")
    if require_data and args.data_dir is None:
        raise ValueError("data_dir must be set. None set now.")


def flags_to_namespace(FLAGS):
    """Snapshot absl FLAGS into a plain namespace (so library code never
    depends on absl state)."""
    cfg = default_config()
    for name in _FLAG_DEFS:
        if name in FLAGS:
            setattr(cfg, name, getattr(FLAGS, name))
    return cfg
