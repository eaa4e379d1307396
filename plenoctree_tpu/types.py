"""Shared pytree types (parity: nerf_sh/nerf/utils.py:38-58)."""

import collections

import flax

Rays = collections.namedtuple("Rays", ("origins", "directions", "viewdirs"))


def namedtuple_map(fn, tup):
    """Apply `fn` to each field of a namedtuple, preserving the type."""
    return type(tup)(*map(fn, tup))


@flax.struct.dataclass
class Stats:
    loss: float
    psnr: float
    loss_c: float
    psnr_c: float
    weight_l2: float
    loss_sp: float
