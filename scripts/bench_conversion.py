"""Conversion wall-clock benchmark (VERDICT r2 task #4: extract+optimize
< 300 s at >=400^2 images).

Generates the surface-like synthetic scene at 400^2, trains a NeRF-SH to a
usable state (timed separately — conversion is the target), then times
octree.extraction + octree.optimization end-to-end, mirroring the
reference's ~15 min/scene full pipeline anchor (README.md:108-109).

Usage: PYTHONPATH=. python scripts/bench_conversion.py [--reso 400]
Writes docs/conversion_timing.json and prints a summary line.
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, timeout=7200):
    t0 = time.time()
    r = subprocess.run(cmd, shell=True, cwd=REPO, capture_output=True,
                       text=True, timeout=timeout)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise RuntimeError(f"failed ({dt:.0f}s): {cmd}")
    return r.stdout + r.stderr, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reso", type=int, default=400)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--grid_depth", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()

    data = "/tmp/conv_bench/data"
    tdir = "/tmp/conv_bench/train"
    import shutil

    shutil.rmtree("/tmp/conv_bench", ignore_errors=True)
    os.makedirs(tdir, exist_ok=True)
    model = (
        "--num_coarse_samples 32 --num_fine_samples 64 --net_depth 4 "
        "--net_width 96 --sh_deg 2 --nouse_viewdirs --factor 0"
    )
    out = {"reso": args.reso, "grid_depth": args.grid_depth,
           "epochs": args.epochs}

    _, out["datagen_s"] = sh(
        "python -c \"from plenoctree_tpu.data.synthetic import "
        "write_blender_dataset; "
        f"write_blender_dataset('{data}', n_train=20, n_test=3, "
        f"resolution={args.reso}, density_scale=8)\""
    )
    _, out["train_s"] = sh(
        f"python -m nerf_sh.train --dataset blender --data_dir {data} "
        f"--train_dir {tdir} --batch_size 2048 --image_batching "
        f"--max_steps {args.steps} --print_every 500 --save_every {args.steps} "
        f"--render_every {args.steps * 2} --lr_init 2e-3 --chunk 4096 "
        f"--sparsity_npoints 256 {model}"
    )
    txt, out["extract_s"] = sh(
        f"python -m octree.extraction --dataset blender --data_dir {data} "
        f"--train_dir {tdir} {model} --init_grid_depth {args.grid_depth} "
        f"--samples_per_cell 8 --renderer_step_size 1e-4 --noeval "
        f"--output {tdir}/tree.npz"
    )
    _, out["opt_s"] = sh(
        f"python -m octree.optimization --input {tdir}/tree.npz "
        f"--dataset blender --data_dir {data} --factor 0 "
        f"--num_epochs {args.epochs} --renderer_step_size 1e-4 "
        f"--output {tdir}/tree_opt.npz"
    )
    out["convert_s"] = out["extract_s"] + out["opt_s"]
    out["target_s"] = 300.0
    print(json.dumps(out))
    with open(os.path.join(REPO, "docs", "conversion_timing.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(
        f"CONVERSION {args.reso}^2 grid_depth={args.grid_depth}: "
        f"extract {out['extract_s']:.0f}s + optimize {out['opt_s']:.0f}s = "
        f"{out['convert_s']:.0f}s (target <300s)"
    )


if __name__ == "__main__":
    sys.exit(main())
