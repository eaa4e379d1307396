"""Drop-in compatible command surface for the reference's `octree` package.

Each submodule forwards to the corresponding plenoctree_tpu.cli tool, so
`python -m octree.extraction ...` etc. work exactly as documented in the
reference README.
"""
