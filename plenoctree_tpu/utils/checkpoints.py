"""Checkpointing: msgpack train-state checkpoints + reference-checkpoint import.

The on-disk layout matches the reference (flax `checkpoint_<step>` files in
train_dir, keep=200 — nerf_sh/train.py:237-242), but the state pytree is a
modern {step, params, opt_state} TrainState over optax.adam instead of the
retired flax.optim.Adam. `restore_checkpoint` transparently *imports* original
JaxNeRF / NeRF-SH checkpoints (the reference torch stack did this with a
kernel-transposing converter, octree/nerf/models.py:66-113; here only the
pytree prefix differs, the math stack is the same, so import is a re-rooting).
"""

import os

import flax
import jax
import numpy as np
import optax
from flax.training import checkpoints as flax_checkpoints


@flax.struct.dataclass
class TrainState:
    step: int
    variables: dict  # full flax variable collection ({'params': ...})
    opt_state: object


def make_optimizer():
    """Adam with lr injected per-step via optax scale_by_learning_rate(1.0)
    composition; the actual lr multiplies gradients in the train step."""
    return optax.adam(learning_rate=1.0)


def create_train_state(variables, lr_init=None):
    del lr_init  # lr is applied per-step inside the train step
    variables = flax.core.unfreeze(variables)
    params = variables["params"]
    tx = make_optimizer()
    return TrainState(step=0, variables=variables, opt_state=tx.init(params))


def save_checkpoint(train_dir, state, step, keep=200):
    state = jax.device_get(state)
    flax_checkpoints.save_checkpoint(
        os.path.abspath(train_dir), state, int(step), keep=keep, overwrite=True
    )


def _looks_like_reference_ckpt(tree):
    return isinstance(tree, dict) and "optimizer" in tree and "target" in tree.get("optimizer", {})


def import_reference_variables(raw):
    """Extract model variables from an original JaxNeRF/NeRF-SH checkpoint
    pytree ({'optimizer': {'target': {'params': ...}, 'state': ...}})."""
    target = raw["optimizer"]["target"]
    if "params" not in target:
        target = {"params": target}
    return flax.core.unfreeze(target)


def restore_checkpoint(train_dir, state):
    """Restore the latest checkpoint in train_dir into `state`.

    Handles both our TrainState layout and original reference checkpoints
    (params imported, optimizer state re-initialized).
    """
    if train_dir is None or not os.path.isdir(train_dir):
        return state
    raw = flax_checkpoints.restore_checkpoint(os.path.abspath(train_dir), target=None)
    if raw is None:
        return state
    if _looks_like_reference_ckpt(raw):
        variables = import_reference_variables(raw)
        step = int(np.asarray(raw["optimizer"]["state"].get("step", 0)))
        tx = make_optimizer()
        variables = _match_leaf_types(state.variables, variables)
        return TrainState(
            step=step, variables=variables, opt_state=tx.init(variables["params"])
        )
    # Our layout: restore with the state as target to recover types.
    restored = flax_checkpoints.restore_checkpoint(
        os.path.abspath(train_dir), target=state
    )
    return restored


def _match_leaf_types(template, loaded):
    """Cast loaded leaves to the template's dtypes/shapes where they match."""

    def cast(t, l):
        arr = np.asarray(l)
        if hasattr(t, "dtype"):
            arr = arr.astype(t.dtype)
        return arr

    return jax.tree.map(cast, template, loaded)


def latest_checkpoint_step(train_dir):
    """Step index of the newest checkpoint file, or None."""
    if train_dir is None or not os.path.isdir(train_dir):
        return None
    latest = flax_checkpoints.latest_checkpoint(os.path.abspath(train_dir))
    if latest is None:
        return None
    try:
        return int(latest.rsplit("_", 1)[-1])
    except ValueError:
        return None
