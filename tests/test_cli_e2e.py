"""End-to-end CLI orchestration tests (VERDICT r3 tasks #6/#8).

One tiny checkpoint is trained through the real `nerf_sh.train` CLI
(subprocess, CPU backend), then:

  * `octree.task_manager` drives a 2-scene x 2-worker conversion fleet
    (extract -> optimize -> evaluate subprocesses) to a results.txt —
    the reference's de-facto benchmark record
    (reference octree/task_manager.py:69-136);
  * `nerf_sh.gen_video` renders orbit frames + poses
    (reference nerf_sh/gen_video.py:152-172);
  * `nerf_sh.gen_mesh` writes a non-empty OBJ isosurface
    (reference nerf_sh/gen_mesh.py:88-158).

All marked slow (subprocess fleets, ~minutes); `-m "not slow"` skips.
"""

import json
import math
import os
import os.path as osp
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# Model flags shared by every stage (no model config is stored in the
# checkpoint — same contract as the reference framework).
MODEL_FLAGS = [
    "--dataset", "blender",
    "--factor", "0",
    "--num_coarse_samples", "8",
    "--num_fine_samples", "8",
    "--net_depth", "2",
    "--net_width", "32",
    "--sh_deg", "1",
    "--nouse_viewdirs",
]


_CACHE_DIR = "/tmp/plenoctree_test_jit_cache"


def _run(args, timeout=900):
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    env.update(
        {
            # The axon sitecustomize overrides JAX_PLATFORMS at interpreter
            # startup; PLENOCTREE_PLATFORM wins via jax.config (package init).
            "JAX_PLATFORMS": "cpu",
            "PLENOCTREE_PLATFORM": "cpu",
            "XLA_FLAGS": "",  # single CPU device per subprocess (fastest)
            # Shared persistent jit cache: the march/shade ladder costs
            # minutes of CPU compiles per process; scene_b and re-runs
            # reuse scene_a's compiles.
            "JAX_COMPILATION_CACHE_DIR": _CACHE_DIR,
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1",
            "TF_CPP_MIN_LOG_LEVEL": "3",
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        }
    )
    r = subprocess.run(
        [sys.executable, "-m"] + args,
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert r.returncode == 0, (
        f"{' '.join(args[:1])} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    )
    return r.stdout


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Synthetic scene + a checkpoint trained through the real train CLI."""
    root = tmp_path_factory.mktemp("cli_e2e")
    data = str(root / "data")
    tdir = str(root / "train")
    from plenoctree_tpu.data.synthetic import write_blender_dataset

    write_blender_dataset(data, n_train=6, n_test=2, resolution=32)
    _run(
        ["nerf_sh.train", "--data_dir", data, "--train_dir", tdir,
         "--batch_size", "128", "--image_batching", "--max_steps", "60",
         "--print_every", "30", "--save_every", "60", "--render_every", "120",
         "--lr_init", "2e-3", "--chunk", "1024", "--sparsity_npoints", "64"]
        + MODEL_FLAGS
    )
    return {"data": data, "train": tdir}


@pytest.mark.slow
def test_task_manager_fleet(tiny_ckpt, tmp_path):
    """2 scenes x 2 workers through extract->optimize->evaluate to results.txt."""
    data_root = tmp_path / "data"
    train_root = tmp_path / "train"
    data_root.mkdir()
    train_root.mkdir()
    for scene in ("scene_a", "scene_b"):
        os.symlink(tiny_ckpt["data"], data_root / scene)
        shutil.copytree(tiny_ckpt["train"], train_root / scene)

    stage = MODEL_FLAGS
    spec = {
        "data_root": str(data_root),
        "train_root": str(train_root),
        "scenes": ["scene_a", "scene_b"],
        "scene_tasks": [
            {
                "train_dir": "{%}",
                "data_dir": "{%}",
                "extr_flags": stage
                + ["--init_grid_depth", "4", "--samples_per_cell", "3",
                   "--renderer_step_size", "1e-3"],
                # tile_opt: the march optimizer's jit ladder costs ~10 min
                # of CPU compiles; the tile optimizer at 32^2 is 4 tiles.
                "opt_flags": stage
                + ["--num_epochs", "1", "--tile_opt",
                   "--renderer_step_size", "1e-3"],
                "eval_flags": stage + ["--renderer_step_size", "1e-3"],
            }
        ],
    }
    task_file = tmp_path / "tasks.json"
    task_file.write_text(json.dumps(spec))

    _run(["octree.task_manager", str(task_file), "--gpus", "0 1"], timeout=1800)

    results_path = tmp_path / "results.txt"
    assert results_path.exists(), "task manager wrote no results.txt"
    rows = [json.loads(l) for l in results_path.read_text().splitlines() if l]
    assert len(rows) == 2
    scenes = {osp.basename(r["scene"]) for r in rows}
    assert scenes == {"scene_a", "scene_b"}
    for r in rows:
        assert "error" not in r, r
        assert math.isfinite(r["psnr"]) and r["psnr"] > 5.0, r
        assert math.isfinite(r["raw_psnr"]), r
        # Each scene's extraction artifact landed where the workers put it
        # (tree_opt.npz only exists when optimization improved val PSNR —
        # task_manager evaluates whichever is present, like the reference).
        out = osp.join(r["scene"], "octrees")
        assert osp.exists(osp.join(out, "tree.npz"))


@pytest.mark.slow
def test_llff_ndc_pipeline(tmp_path):
    """LLFF-format scene through train -> extract -> optimize -> evaluate
    with NDC active at every stage (VERDICT r4 #5).

    NDC is keyed off 'llff' in the --config path, matching the reference
    (octree/optimization.py:170-173); evaluation runs BOTH the exact march
    (reported metrics) and --fast_eval (the Pallas tile renderer's NDC
    branch, reference serving path svox render_persp + NDCConfig).
    """
    from plenoctree_tpu.data.synthetic import write_llff_dataset

    data = str(tmp_path / "llff_scene")
    tdir = str(tmp_path / "train")
    write_llff_dataset(data, n_views=10, resolution=32)
    cfg_yaml = tmp_path / "llff_tiny.yaml"
    cfg_yaml.write_text(
        "dataset: llff\nllffhold: 5\nfactor: 0\nwhite_bkgd: false\n"
    )
    model = [
        "--config", str(cfg_yaml),
        "--num_coarse_samples", "8",
        "--num_fine_samples", "8",
        "--net_depth", "2",
        "--net_width", "32",
        "--sh_deg", "1",
        "--nouse_viewdirs",
    ]
    _run(
        ["nerf_sh.train", "--data_dir", data, "--train_dir", tdir,
         "--batch_size", "128", "--image_batching", "--max_steps", "60",
         "--print_every", "30", "--save_every", "60", "--render_every", "120",
         "--lr_init", "2e-3", "--chunk", "1024", "--sparsity_npoints", "64"]
        + model
    )
    tree = osp.join(tdir, "tree.npz")
    out = _run(
        ["octree.extraction", "--data_dir", data, "--train_dir", tdir,
         "--output", tree, "--init_grid_depth", "4", "--samples_per_cell", "3",
         "--renderer_step_size", "1e-3",
         # NDC device coords: the warped frustum spans [-1, 1]^3.
         "--center", "0 0 0", "--radius", "1.05"]
        + model
    )
    assert osp.exists(tree)
    raw_psnr = float(out.split("Average PSNR")[-1].split()[0])
    assert math.isfinite(raw_psnr) and raw_psnr > 5.0, out[-2000:]

    tree_opt = osp.join(tdir, "tree_opt.npz")
    _run(
        ["octree.optimization", "--input", tree, "--data_dir", data,
         "--train_dir", tdir, "--output", tree_opt, "--num_epochs", "1",
         "--renderer_step_size", "1e-3"]
        + model,
        timeout=1800,
    )
    best = tree_opt if osp.exists(tree_opt) else tree

    out_march = _run(
        ["octree.evaluation", "--input", best, "--data_dir", data,
         "--train_dir", tdir, "--renderer_step_size", "1e-3"] + model
    )
    psnr_march = float(out_march.split("Average PSNR")[-1].split()[0])
    assert math.isfinite(psnr_march) and psnr_march > 5.0, out_march[-2000:]

    out_tile = _run(
        ["octree.evaluation", "--input", best, "--data_dir", data,
         "--train_dir", tdir, "--renderer_step_size", "1e-3", "--fast_eval"]
        + model
    )
    psnr_tile = float(out_tile.split("Average PSNR")[-1].split()[0])
    # The tile renderer is the serving path (within-chunk ordering is
    # mean-direction approximate); it must land near the exact march.
    assert math.isfinite(psnr_tile) and abs(psnr_tile - psnr_march) < 1.5, (
        f"NDC tile serving {psnr_tile:.2f} dB vs march {psnr_march:.2f} dB\n"
        + out_tile[-2000:]
    )


@pytest.mark.slow
def test_gen_video_smoke(tiny_ckpt, tmp_path):
    poses_file = str(tmp_path / "poses.txt")
    _run(
        ["nerf_sh.gen_video", "--data_dir", tiny_ckpt["data"],
         "--train_dir", tiny_ckpt["train"], "--num_views", "3",
         "--height", "32", "--width", "32", "--chunk", "1024",
         "--radius", "3.0", "--write_poses", poses_file]
        + MODEL_FLAGS
    )
    frames_dir = osp.join(tiny_ckpt["train"], "video", "e300", "frames")
    frames = sorted(os.listdir(frames_dir))
    assert len(frames) == 3
    import imageio.v2 as imageio

    img = imageio.imread(osp.join(frames_dir, frames[0]))
    assert img.shape[:2] == (32, 32)
    assert np.isfinite(img).all()
    poses = np.loadtxt(poses_file).reshape(-1, 4, 4)
    assert poses.shape[0] == 3 and np.isfinite(poses).all()
    # Orbit poses: camera positions stay on the requested radius.
    np.testing.assert_allclose(
        np.linalg.norm(poses[:, :3, 3], axis=1), 3.0, rtol=1e-5
    )


@pytest.mark.slow
def test_gen_mesh_smoke(tiny_ckpt):
    _run(
        ["nerf_sh.gen_mesh", "--data_dir", tiny_ckpt["data"],
         "--train_dir", tiny_ckpt["train"], "--reso", "24",
         # iso 0.5, not the CLI-default 2.0: the 60-step fixture's sigma
         # field tops out near 1.1 (measured; hundreds of grid points sit
         # above 0.5), so 2.0 made the test a coin flip on training
         # numerics drift while 0.5 exercises the same isosurface path.
         "--c1", "-1.5", "--c2", "1.5", "--iso", "0.5",
         "--point_chunk", "8192"]
        + MODEL_FLAGS
    )
    obj_path = osp.join(tiny_ckpt["train"], "mesh.obj")
    assert osp.exists(obj_path)
    n_v = n_f = 0
    with open(obj_path) as f:
        for line in f:
            if line.startswith("v "):
                n_v += 1
                assert all(math.isfinite(float(x)) for x in line.split()[1:4])
            elif line.startswith("f "):
                n_f += 1
    assert n_v > 0 and n_f > 0, f"empty mesh: {n_v} verts {n_f} faces"
