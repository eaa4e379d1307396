"""CLI entry points. Invoke as ``python -m plenoctree_tpu.cli.<tool>`` or via
the drop-in compatibility shims ``python -m nerf_sh.<tool>`` /
``python -m octree.<tool>`` which mirror the reference command surface."""
