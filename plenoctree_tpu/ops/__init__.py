"""Pure-function math ops: positional encoding, SH/SG bases, ray sampling,
volumetric compositing, image metrics.

Everything here is shape-polymorphic pure ``jnp`` (jit/vmap/shard_map safe),
unit-tested against analytic values in ``tests/test_ops*.py``.
"""

from plenoctree_tpu.ops.posenc import posenc
from plenoctree_tpu.ops.sh import eval_sh, sh_basis, SH_C0, SH_C1, SH_C2, SH_C3, SH_C4
from plenoctree_tpu.ops.sg import eval_sg, spher2cart, euler2mat
from plenoctree_tpu.ops.sampling import (
    cast_rays,
    sample_along_rays,
    piecewise_constant_pdf,
    sample_pdf,
    add_gaussian_noise,
)
from plenoctree_tpu.ops.rendering import volumetric_rendering
from plenoctree_tpu.ops.metrics import compute_psnr, compute_ssim
