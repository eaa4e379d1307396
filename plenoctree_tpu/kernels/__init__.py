"""Pallas TPU kernels for the hot compute paths.

fused_mlp: the NeRF trunk as one kernel — weights resident in VMEM, per-tile
activations never touch HBM, flash-style recompute in the backward pass.
"""
