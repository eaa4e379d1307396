"""On-record PSNR parity table (VERDICT round-2 task #5).

Runs the full pipeline (train -> eval -> extract -> [optimize] -> evaluate)
on the procedural synthetic scene at two quality levels and writes
docs/PARITY_RESULTS.md with raw + optimized octree PSNR/SSIM next to the
reference's published anchor (drums: NeRF-SH 26.0 / raw tree 25.01 /
optimized 25.65 — reference README.md:173-176).

Usage: python scripts/parity_table.py [--level draft|full|both]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVELS = {
    "draft": dict(
        reso=48, n_train=12, sh_deg=1, width=48, depth=3, samples="16 16",
        steps=300, batch=256, grid_depth=6, epochs=10, step_size=1e-3,
    ),
    # "full" is sized to reproduce the reference's signature (README.md:173-176:
    # NeRF-SH 26.0 -> raw 25.01 -> opt 25.65): train to convergence, extract
    # at 256^3. density_scale=8 makes the analytic blobs optically thick
    # (surface-like occupancy, the class the reference's blender scenes are
    # in) so visibility masking prunes interiors — the round-2 run at fog
    # density kept 11.5M of 11.7M leaves and took 1452 s to extract.
    "full": dict(
        reso=128, n_train=30, sh_deg=2, width=96, depth=4, samples="32 64",
        steps=6000, batch=2048, grid_depth=8, epochs=30, step_size=1e-4,
        density_scale=8,
    ),
}


def sh(cmd, timeout=2400):
    t0 = time.time()
    r = subprocess.run(
        cmd, shell=True, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise RuntimeError(f"failed ({dt:.0f}s): {cmd}")
    return r.stdout + r.stderr, dt


def last_metric(text, pattern):
    hits = re.findall(pattern, text)
    return float(hits[-1]) if hits else float("nan")


def run_level(name):
    cfg = LEVELS[name]
    data = f"/tmp/parity_{name}/data"
    tdir = f"/tmp/parity_{name}/train"
    # Fresh run: a stale checkpoint at max_steps makes "training" a no-op
    # and poisons every downstream number.
    import shutil

    shutil.rmtree(f"/tmp/parity_{name}", ignore_errors=True)
    os.makedirs(tdir, exist_ok=True)
    nc, nf = cfg["samples"].split()
    model = (
        f"--num_coarse_samples {nc} --num_fine_samples {nf} "
        f"--net_depth {cfg['depth']} --net_width {cfg['width']} "
        f"--sh_deg {cfg['sh_deg']} --nouse_viewdirs --factor 0"
    )
    out = {}

    dens = cfg.get("density_scale", 1)
    sh(
        "python -c \"from plenoctree_tpu.data.synthetic import write_blender_dataset; "
        f"write_blender_dataset('{data}', n_train={cfg['n_train']}, n_test=3, "
        f"resolution={cfg['reso']}, density_scale={dens})\""
    )
    _, out["train_s"] = sh(
        f"python -m nerf_sh.train --dataset blender --data_dir {data} "
        f"--train_dir {tdir} --batch_size {cfg['batch']} --image_batching "
        f"--max_steps {cfg['steps']} --print_every 200 --save_every {cfg['steps']} "
        f"--render_every {cfg['steps'] * 2} --lr_init 2e-3 --chunk 4096 "
        f"--sparsity_npoints 256 {model}",
        timeout=3600,
    )
    txt, out["eval_s"] = sh(
        f"python -m nerf_sh.eval --dataset blender --data_dir {data} "
        f"--train_dir {tdir} --batch_size {cfg['batch']} --chunk 8192 {model}"
    )
    out["nerf_psnr"] = last_metric(txt, r"Average over \d+ images: PSNR ([\d.]+)")
    out["nerf_ssim"] = last_metric(txt, r"SSIM ([\d.]+)")

    txt, out["extract_s"] = sh(
        f"python -m octree.extraction --dataset blender --data_dir {data} "
        f"--train_dir {tdir} {model} --init_grid_depth {cfg['grid_depth']} "
        f"--samples_per_cell 8 --renderer_step_size {cfg['step_size']} "
        f"--output {tdir}/tree.npz"
    )
    out["raw_psnr"] = last_metric(txt, r"Average PSNR ([\d.]+)")

    txt, out["opt_s"] = sh(
        f"python -m octree.optimization --input {tdir}/tree.npz --dataset blender "
        f"--data_dir {data} --factor 0 --num_epochs {cfg['epochs']} "
        f"--renderer_step_size {cfg['step_size']} --output {tdir}/tree_opt.npz",
        timeout=3600,
    )
    txt, out["opt_eval_s"] = sh(
        f"python -m octree.evaluation --input {tdir}/tree_opt.npz --dataset blender "
        f"--data_dir {data} --factor 0 --renderer_step_size {cfg['step_size']}"
    )
    out["opt_psnr"] = last_metric(txt, r"Average PSNR ([\d.]+)")
    out["opt_ssim"] = last_metric(txt, r"SSIM ([\d.]+)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="both", choices=["draft", "full", "both"])
    args = ap.parse_args()
    levels = ["draft", "full"] if args.level == "both" else [args.level]
    results = {}
    for name in levels:
        print(f"=== level {name} ===", flush=True)
        results[name] = run_level(name)
        print(json.dumps({name: results[name]}), flush=True)

    lines = [
        "# PSNR parity evidence (synthetic scene, real TPU v5e runs)",
        "",
        "Generated by `scripts/parity_table.py`. Reference anchor (real data,",
        "drums, reference README.md:173-176): NeRF-SH 26.0 -> raw tree 25.01 ->",
        "optimized 25.65 — i.e. extraction costs ~1 dB and optimization wins",
        "most of it back. The same signature must appear here.",
        "",
        "| level | NeRF-SH PSNR | raw tree PSNR | optimized PSNR | opt SSIM |"
        " train s | extract s | optimize s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['nerf_psnr']:.2f} | {r['raw_psnr']:.2f} | "
            f"{r['opt_psnr']:.2f} | {r['opt_ssim']:.4f} | {r['train_s']:.0f} | "
            f"{r['extract_s']:.0f} | {r['opt_s']:.0f} |"
        )
    lines += [
        "",
        "Historical: the round-2 full-level row (14.28* / 39.28 / 23.41*) is",
        "INVALID — the NeRF number was a backend miscompile at batch 8192 and",
        "the optimized number a K=64 slot-death bug; both fixed (canary +",
        "sticky K regrowth, see docs/STATUS.md). It is retained only in",
        "parity_results.json under `full_r2_invalid`.",
        "",
    ]
    # Merge results into the existing json rather than clobbering it, so the
    # invalid-marked historical rows survive (VERDICT r4 weak-#3: tooling
    # reading the json must never see invalid numbers unmarked).
    json_path = os.path.join(REPO, "docs", "parity_results.json")
    merged = {}
    if os.path.exists(json_path):
        with open(json_path) as f:
            merged = json.load(f)
        if "full" in merged and "full" in results and merged["full"].get(
            "nerf_psnr"
        ) == 14.2754:
            merged["full_r2_invalid"] = dict(
                merged.pop("full"),
                invalid="NeRF PSNR was a backend miscompile at batch 8192; "
                "optimized PSNR was destroyed by the K=64 slot-death bug",
            )
    merged.update(results)
    with open(os.path.join(REPO, "docs", "PARITY_RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    with open(json_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote docs/PARITY_RESULTS.md")


if __name__ == "__main__":
    main()
