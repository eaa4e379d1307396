"""Learning-rate schedule (parity: nerf_sh/nerf/utils.py:483-515).

Log-linear interpolation from lr_init to lr_final over max_steps with an
optional reverse-cosine warmup window. Implemented with jnp so it can live
inside the jitted train step as an optax schedule (the reference computed it
host-side per step and fed it through pmap's broadcast argument).
"""

import functools

import jax.numpy as jnp
import numpy as np


def learning_rate_decay(step, lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1.0):
    """Continuous log-lerp decay with optional delayed start. jit-safe."""
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return delay_rate * log_lerp


def schedule_from_config(cfg):
    """An optax-compatible `step -> lr` schedule from a config namespace."""
    return functools.partial(
        learning_rate_decay,
        lr_init=cfg.lr_init,
        lr_final=cfg.lr_final,
        max_steps=cfg.max_steps,
        lr_delay_steps=cfg.lr_delay_steps,
        lr_delay_mult=cfg.lr_delay_mult,
    )
