"""plenoctree_tpu — a TPU-native NeRF-SH + PlenOctree framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of sxyu/plenoctree
(NeRF-SH training + PlenOctree extraction/optimization/serving), built for
TPU hardware: one stack (no JAX<->torch seam), pjit/NamedSharding data
parallelism over an ICI mesh, XLA-friendly octree kernels, and Pallas
fused kernels on the hot paths.

Reference parity map lives in SURVEY.md; per-module docstrings cite the
reference files whose behavior they reproduce.
"""

__version__ = "0.1.0"
