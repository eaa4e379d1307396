"""Device mesh construction and sharding placement helpers."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape=None, devices=None):
    """Build a Mesh over the available devices.

    Args:
      mesh_shape: None/""/() for a 1-D all-data mesh; otherwise an iterable or
        comma string of up to two ints (data, model). -1 infers one axis.
      devices: explicit device list (defaults to jax.devices()).

    Returns:
      jax.sharding.Mesh with axes ("data",) or ("data", "model").
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if isinstance(mesh_shape, str):
        mesh_shape = [int(x) for x in mesh_shape.split(",") if x.strip()] or None
    if not mesh_shape:
        mesh_shape = (n,)
    mesh_shape = list(mesh_shape)
    if -1 in mesh_shape:
        known = int(np.prod([s for s in mesh_shape if s != -1]))
        mesh_shape[mesh_shape.index(-1)] = n // known
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not cover {n} devices")
    axis_names = (DATA_AXIS,) if len(mesh_shape) == 1 else (DATA_AXIS, MODEL_AXIS)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh, ndim=None):
    """Shard the leading (ray/point batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_pytree_batch(batch, mesh):
    """Place a host pytree of [N, ...] arrays sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_pytree(tree, mesh):
    """Replicate a pytree (model/optimizer state) across the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def prefetch_to_device(iterator, mesh, size=3):
    """Device-prefetch generator: ship batch k+`size` while step k runs.

    Parity: flax.jax_utils.prefetch_to_device(dataset, 3) in the reference
    train loop (nerf_sh/train.py:184). A daemon thread pulls host batches
    and device_puts them (data-axis sharded) into a bounded queue, so the
    train loop never blocks on host->device transfer.
    """
    import queue
    import threading

    q = queue.Queue(maxsize=size)
    done = object()

    def worker():
        # An exception must reach the consumer: otherwise q.get() below
        # blocks forever and the train loop hangs silently (ADVICE r2).
        try:
            for batch in iterator:
                q.put(shard_pytree_batch(batch, mesh))
            q.put(done)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def pad_to_multiple(x, multiple, axis=0):
    """Edge-pad `x` along `axis` to a multiple; returns (padded, pad_amount).

    Parity with the chunked-inference padding in nerf_sh/nerf/utils.py:357-369.
    """
    size = x.shape[axis]
    remainder = size % multiple
    if remainder == 0:
        return x, 0
    pad = multiple - remainder
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge"), pad
