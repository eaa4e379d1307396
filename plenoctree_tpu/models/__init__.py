"""Model zoo: the coarse+fine NeRF with SH/SG/viewdir color heads."""

from plenoctree_tpu.models.nerf import (
    NerfModel,
    construct_nerf,
    get_model,
    get_model_state,
)
from plenoctree_tpu.models.mlp import TrunkMLP
