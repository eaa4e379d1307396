"""PlenOctree: sparse N^3 tree structure, differentiable TPU renderer,
extraction/optimization pipeline, compression.

TPU-native replacement for the external svox CUDA package the reference
depends on (SURVEY.md §2.1): flat-array tree (XLA-friendly gathers), numpy
host-side construction, jnp/Pallas device rendering, svox-compatible
tree.npz serialization so volrend and existing trees interoperate.
"""

from plenoctree_tpu.octree.n3tree import N3Tree, DataFormat
