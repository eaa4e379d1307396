"""Per-scene conversion fleet orchestrator.

Parity: octree/task_manager.py — JSON task files with '{%}' scene templating,
a queue of scenes dispatched to worker processes (one per accelerator
partition), each running extraction -> optimization -> evaluation as
subprocesses and recording capacity/PSNR/SSIM/LPIPS into results.txt.

TPU-native changes: workers pin devices via JAX_PLATFORMS/TPU visible-chip
env instead of CUDA_VISIBLE_DEVICES; metrics are scraped from each stage's
machine-readable results.json (written by the CLIs) instead of regexing
stdout (the reference scraped prints, octree/task_manager.py:107-115).

Usage:
  python -m octree.task_manager tasks.json --gpus="0 1 2 3"
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
from multiprocessing import Process, Queue


def parse_results_file(path):
    if not osp.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def convert_one(task, device, python=sys.executable):
    """Run extraction -> optimization -> evaluation for one scene."""
    env = dict(os.environ)
    if device is not None:
        # One worker per accelerator: GPU via CUDA_VISIBLE_DEVICES, TPU via
        # chip visibility (harmless if unused by the platform).
        env["CUDA_VISIBLE_DEVICES"] = str(device)
        env["TPU_VISIBLE_CHIPS"] = str(device)
        env.setdefault("TPU_PROCESS_BOUNDS", "1,1,1")

    train_dir = task["train_dir"]
    data_dir = task["data_dir"]
    config = task.get("config")
    octree_name = task.get("octree_name", "")
    out_dir = osp.join(train_dir, "octrees" if not octree_name else octree_name)
    os.makedirs(out_dir, exist_ok=True)
    tree_path = osp.join(out_dir, "tree.npz")
    tree_opt_path = osp.join(out_dir, "tree_opt.npz")

    base = ["--train_dir", train_dir, "--data_dir", data_dir]
    if config:
        base += ["--config", config]

    def run(mod, extra):
        cmd = [python, "-m", mod] + base + extra
        print("[worker]", " ".join(cmd), flush=True)
        return subprocess.run(cmd, env=env).returncode

    results = {"scene": train_dir}
    rc = run(
        "octree.extraction",
        ["--output", tree_path] + task.get("extr_flags", []),
    )
    if rc != 0:
        results["error"] = f"extraction failed rc={rc}"
        return results
    results.update(
        {"raw_" + k: v for k, v in parse_results_file(tree_path + ".results.json").items()}
    )

    rc = run(
        "octree.optimization",
        ["--input", tree_path, "--output", tree_opt_path] + task.get("opt_flags", []),
    )
    if rc != 0:
        results["error"] = f"optimization failed rc={rc}"
        return results

    eval_input = tree_opt_path if osp.exists(tree_opt_path) else tree_path
    rc = run(
        "octree.evaluation",
        ["--input", eval_input] + task.get("eval_flags", []),
    )
    if rc != 0:
        results["error"] = f"evaluation failed rc={rc}"
        return results
    results.update(parse_results_file(eval_input + ".results.json"))
    return results


def process_main(queue, results_path, device):
    while True:
        task = queue.get()
        if task is None:
            return
        results = convert_one(task, device)
        with open(results_path, "a") as f:
            f.write(json.dumps(results) + "\n")
        print("[worker] done:", results, flush=True)


def expand_tasks(spec):
    """Expand a task-file spec into concrete per-scene tasks.

    '{%}' templating over the scenes list + data/train root joining
    (parity: octree/task_manager.py:158-167).
    """
    data_root = spec.get("data_root", "")
    train_root = spec.get("train_root", "")
    tasks = []
    for task in spec.get("scene_tasks", []):
        for scene in spec.get("scenes", []):
            tasks.append(json.loads(json.dumps(task).replace("{%}", scene)))
    tasks.extend(json.loads(json.dumps(t)) for t in spec.get("tasks", []))
    for t in tasks:
        t["train_dir"] = osp.join(train_root, t["train_dir"])
        t["data_dir"] = osp.join(data_root, t["data_dir"])
    return tasks


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("task_file", type=str, help="JSON task file")
    parser.add_argument(
        "--gpus",
        type=str,
        default="0",
        help='space-separated accelerator ids, e.g. "0 1 2 3" (one worker each)',
    )
    args = parser.parse_args(argv)

    with open(args.task_file) as f:
        spec = json.load(f)
    tasks = expand_tasks(spec)

    results_path = osp.join(osp.dirname(osp.abspath(args.task_file)), "results.txt")
    devices = args.gpus.split()
    queue = Queue()
    for t in tasks:
        queue.put(t)
    for _ in devices:
        queue.put(None)

    if len(devices) == 1:
        process_main(queue, results_path, devices[0])
    else:
        procs = [
            Process(target=process_main, args=(queue, results_path, d))
            for d in devices
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
    print("All tasks finished; results in", results_path)


if __name__ == "__main__":
    sys.exit(main())
