"""Metrics sink: TensorBoard events (via tensorboardX) plus a
machine-readable metrics.jsonl next to them.

Parity: flax.metrics.tensorboard usage in nerf_sh/train.py:179-226 — with the
jsonl addition so tooling (bench, task_manager results scraping) never parses
stdout the way the reference's task_manager had to (octree/task_manager.py:107-115).
"""

import json
import os
import time


class MetricsWriter:
    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag, value, step):
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step), "ts": time.time()})
            + "\n"
        )
        self._jsonl.flush()

    def image(self, tag, img, step):
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
