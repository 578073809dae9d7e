"""Deterministic seeding (reference: util/utils.py:339-348 set_seed).

JAX is deterministic by construction via explicit PRNG keys; the host-side
numpy sampling streams are seeded here. Returns a jax.random key for the
device-side streams so every consumer threads randomness explicitly.
"""
from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)
