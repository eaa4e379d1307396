"""Host-side IO helpers: image save, host-0 gating, timings log.

Parity: nerf_sh/nerf/utils.py:469-480 (save_img), :733-741 (host0 gating),
nerf_sh/train.py:139-144 (timings.txt) + parse_timing.py.
"""

import os
from datetime import datetime

import numpy as np
from PIL import Image


def save_img(img, pth):
    """Save an image (clipped to [0, 1]) as PNG."""
    arr = (np.clip(np.asarray(img), 0.0, 1.0) * 255.0).astype(np.uint8)
    with open(os.path.expanduser(pth), "wb") as f:
        Image.fromarray(arr).save(f, "PNG")


def host0_print(*args, **kwargs):
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs)


def host0_tqdm(iterable, **kwargs):
    import jax

    if jax.process_index() == 0:
        from tqdm import tqdm

        return tqdm(iterable, **kwargs)
    return iterable


class TimingsLog:
    """Appends `<step> <iso timestamp>` lines, parseable by parse_timing."""

    def __init__(self, path):
        self._f = open(path, "a")

    def write(self, step):
        self._f.write(f"{step} {datetime.now().isoformat()}\n")
        self._f.flush()


def parse_timings(path):
    """Parse a timings.txt into a list of (step, datetime); total hours like
    the reference's nerf_sh/parse_timing.py."""
    entries = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) != 2:
                continue
            entries.append((int(parts[0]), datetime.fromisoformat(parts[1])))
    return entries


def timings_total_hours(path):
    entries = parse_timings(path)
    if len(entries) < 2:
        return 0.0
    total = 0.0
    # Sum gaps between consecutive entries, restarting at step resets.
    for (s0, t0), (s1, t1) in zip(entries, entries[1:]):
        if s1 >= s0:
            total += (t1 - t0).total_seconds()
    return total / 3600.0
