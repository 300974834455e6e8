"""Deterministic seeding.

Equivalent of reference utils/seed.py:6-11. On TPU/JAX randomness is
explicit (jax.random keys), so 'seeding' means constructing the root key;
numpy/python RNGs are still seeded for host-side data pipeline parity.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def rank_seed(seed: int, rank: int) -> int:
    """Per-rank seed offset (reference inference engines add the rank,
    e.g. tools/inferences/inference_i2vgen_entrance.py:94)."""
    return seed + rank
