"""Deterministic seeding.

Equivalent of reference utils/seed.py:6-11. On TPU/JAX randomness is
explicit (jax.random keys), so 'seeding' means constructing the root key;
numpy/python RNGs are still seeded for host-side data pipeline parity.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int, prng_impl: str | None = None) -> jax.Array:
    """Seed host RNGs and return the root jax PRNG key.

    prng_impl selects the jax PRNG ("threefry2x32" default, "rbg" =
    hardware RNG). Train configs set ``prng_impl: rbg``: threefry
    dropout-mask generation is pure VPU elementwise work that remat
    replays again in the backward — measured 6.9% of the 1.4B-UNet
    train step at 16f b4 (1787.4 -> 1664.6 ms/it,
    tools_dev/profile_remat.py PROF_RNG=rbg, r5). Both impls are
    deterministic per (seed, fold path); checkpoints/resume are
    unaffected (keys are rebuilt from the step counter), but the noise
    stream differs across impls, so the flag lives in the config where
    it is visible to reproduction."""
    if prng_impl:
        jax.config.update("jax_default_prng_impl", prng_impl)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def rank_seed(seed: int, rank: int) -> int:
    """Per-rank seed offset (reference inference engines add the rank,
    e.g. tools/inferences/inference_i2vgen_entrance.py:94)."""
    return seed + rank
