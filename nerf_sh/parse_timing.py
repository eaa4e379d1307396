"""Shim: wall-clock timings.txt parser (reference: nerf_sh/parse_timing.py)."""

import sys

from plenoctree_tpu.utils.io import timings_total_hours

if __name__ == "__main__":
    for path in sys.argv[1:]:
        print(path, f"{timings_total_hours(path):.2f} hours")
