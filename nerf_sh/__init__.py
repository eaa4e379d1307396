"""Drop-in compatible command surface for the reference's `nerf_sh` package.

Each submodule forwards to the corresponding plenoctree_tpu.cli tool, so
`python -m nerf_sh.train --config nerf_sh/config/blender ...` works exactly
as documented in the reference README.
"""
