"""Mesh construction + named-axis conventions.

The reference is single-process single-device (no torch.distributed anywhere
in its tree); multi-chip execution is a new first-class subsystem of this
framework (SURVEY.md §2.5). One thin module owns mesh construction and axis
names so every other layer stays mesh-agnostic:

  * ``data``  — batch dimension of pairwise/contrastive losses (DP);
    gradients psum-reduced by XLA across this axis.
  * ``model`` — row dimension of the big embedding tables (TP) and the item
    axis of the retrieval sweep; lookups/collectives ride ICI.

Everything runs under ``jax.jit`` with sharding annotations; XLA's SPMD
partitioner inserts the all-gather / psum / all-to-all collectives. A (1, 1)
mesh degenerates to the single-chip path, so models never branch on topology.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_mesh(
    n_data: int = 1, n_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"mesh ({n_data}x{n_model}) needs {need} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev_array, (AXIS_DATA, AXIS_MODEL))


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """2D mesh over all devices: data-major factorization."""
    n = n_devices or len(jax.devices())
    n_model = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and n // cand >= 1:
            n_model = cand
            break
    return make_mesh(n // n_model, n_model)


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard an (N, d) embedding table over the model axis."""
    return NamedSharding(mesh, P(AXIS_MODEL, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a per-example batch dim over the data axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_dict(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
