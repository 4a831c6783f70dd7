"""Deterministic seeding (reference `engineer/utils/seed.py`).

JAX is functionally deterministic by construction; this seeds the host-side
RNGs (python/numpy — data shuffling, dataset generation) and returns the
root jax PRNG key for parameter init.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
