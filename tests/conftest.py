"""Test configuration: force an 8-device virtual CPU mesh.

The environment's sitecustomize registers the axon TPU backend for every
interpreter before conftest runs, so plain env vars are too late; the jax
config update below still wins because backends initialize lazily. Tests
must run on CPU — the TPU tunnel makes per-test jit compiles ~100x slower
and sharding tests need 8 devices.
"""
import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
