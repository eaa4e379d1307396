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

import os as _os

if _os.environ.get("PLENOCTREE_PLATFORM"):
    # Hard platform override for subprocess tests/tools. The axon
    # sitecustomize registers the TPU plugin at interpreter startup and
    # wins over the JAX_PLATFORMS env var, so CPU-intended subprocesses
    # silently grab the (single, shared) TPU; the jax config knob takes
    # precedence over both. Every CLI imports this package before first
    # device use.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["PLENOCTREE_PLATFORM"])
