"""CLI entry points. Invoke as ``python -m plenoctree_tpu.cli.<tool>`` or via
the drop-in compatibility shims ``python -m nerf_sh.<tool>`` /
``python -m octree.<tool>`` which mirror the reference command surface."""

import os as _os

# Persistent XLA compilation cache: TPU compiles in this environment are
# remote and slow (minutes for large Pallas kernels); cache across runs.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

# Orbax/absl INFO chatter drowns the training logs; keep CLIs at WARNING.
try:
    from absl import logging as _absl_logging

    _absl_logging.set_verbosity(_absl_logging.WARNING)
except ImportError:
    pass
