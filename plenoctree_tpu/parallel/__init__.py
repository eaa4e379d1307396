"""Distributed runtime: device mesh, NamedSharding placement, chunked
multi-device inference.

Replaces the reference's pmap + shard/unshard/replicate machinery
(nerf_sh/nerf/utils.py:518-535,701-731; nerf_sh/train.py:163-188) with
jit-over-Mesh GSPMD: state is replicated, ray batches are sharded on the
"data" axis, and XLA inserts the {psum, all_gather} collectives over ICI.
"""

from plenoctree_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    prefetch_to_device,
    shard_pytree_batch,
    replicate_pytree,
    pad_to_multiple,
)
