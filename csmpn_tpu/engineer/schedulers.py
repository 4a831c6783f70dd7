"""Learning-rate schedules (optax-style) mirroring the reference
`engineer/schedulers/cosine.py`."""
from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_annealing_schedule(base_lr: float, max_steps: int,
                              warmup_steps: int = 0, decay_steps: int = 0):
    """Cosine warmup -> plateau -> cosine decay (reference
    CosineAnnealingLR.get_lr, cosine.py:25-46).  Returns an optax schedule
    ``step -> lr``."""
    stable_steps = max_steps - warmup_steps - decay_steps

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = jnp.where(
            warmup_steps > 0,
            0.5 - 0.5 * jnp.cos(jnp.pi * step / max(warmup_steps, 1)),
            1.0)
        decay = jnp.where(
            decay_steps > 0,
            0.5 + 0.5 * jnp.cos(
                jnp.pi * (step - warmup_steps - stable_steps)
                / max(decay_steps, 1)),
            1.0)
        s = jnp.where(
            step < warmup_steps, warm,
            jnp.where(step < warmup_steps + stable_steps, 1.0, decay))
        return base_lr * s

    return schedule


def cosine_cyclic_schedule(base_lr: float, max_steps: int, cycle_steps: int,
                           lr_min: float = 1e-7):
    """Cyclic cosine (reference CosineLR, cosine.py:49-80)."""
    del max_steps

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        return 0.5 * ((lr_min - base_lr)
                      * jnp.cos(2 * math.pi * step / cycle_steps)
                      + lr_min + base_lr)

    return schedule
