"""Datasets (Blender / LLFF / NSVF / procedural synthetic) and ray generation.

Host-side numpy with a background prefetch thread feeding device-sharded
batches (parity: nerf_sh/nerf/datasets.py).
"""

from plenoctree_tpu.data.rays import generate_rays, convert_to_ndc
from plenoctree_tpu.data.datasets import get_dataset, dataset_dict
