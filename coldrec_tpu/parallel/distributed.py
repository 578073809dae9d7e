"""Multi-host execution: process group, global placement, per-host feeding.

SURVEY §5.8 / §2.5 "collectives backend": the reference is strictly
single-process (``/root/reference/main.py:25`` picks ``cuda:<id>``/cpu; no
``torch.distributed`` anywhere in its tree), so multi-host execution is a
new first-class subsystem here. One thin module owns ALL process-group
plumbing so the rest of the framework stays topology-agnostic:

  * :func:`init_distributed` — ``jax.distributed.initialize`` when the
    COLDREC_COORDINATOR / COLDREC_NUM_PROCESSES / COLDREC_PROCESS_ID env
    vars (or explicit args) configure a group; called by main.py before
    first device use. Collectives compile over ICI within a slice and DCN
    across slices once the mesh spans all global devices.
  * :func:`host_to_global` — place a host array onto a (possibly
    multi-process) NamedSharding. Single-process: ``jax.device_put``.
    Multi-process: ``jax.make_array_from_callback`` — each process
    materializes ONLY the index slices its addressable devices own, which
    is the general form of ``jax.make_array_from_process_local_data``
    (every process here holds the full host value because samplers run an
    identical host RNG stream per process, so the per-device callback is a
    pure local slice — no wire traffic).
  * :func:`localize` — bring a global (possibly non-addressable) array
    back to a process-local replicated array for host-side work (eval
    sweeps, checkpoints): fully-replicated arrays are read directly,
    sharded ones ride one ``process_allgather``.
  * :func:`partition_chunks` / :func:`allgather_host` — split the eval
    user-chunk sweep across processes and merge the per-host rec lists
    (the multi-host analog of BaseRecommender.py:170-183's single-GPU
    loop).

Used by models/warm_base.py (mesh setup + batch feeding), runtime/eval.py
(per-host eval partition) and main.py (group init + rank-0 result writer).
Integration-tested by tests/test_multiprocess.py, which launches two real
OS processes over a localhost coordinator on the CPU backend.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host process group when configured.

    Returns True if a multi-process group is active. Controlled by args or
    the COLDREC_COORDINATOR / COLDREC_NUM_PROCESSES / COLDREC_PROCESS_ID
    env vars; absent both, stays single-process.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "COLDREC_COORDINATOR"
    )
    if num_processes is None and os.environ.get("COLDREC_NUM_PROCESSES"):
        num_processes = int(os.environ["COLDREC_NUM_PROCESSES"])
    if process_id is None and os.environ.get("COLDREC_PROCESS_ID"):
        process_id = int(os.environ["COLDREC_PROCESS_ID"])
    if not coordinator_address and num_processes is None:
        return False  # single process
    import jax

    try:
        # CPU backends need an explicit cross-process collectives impl
        # (gloo ships in jaxlib); TPU backends ignore it — ICI/DCN
        # collectives come from the platform.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def global_mesh(n_model: int = 1):
    """Mesh over ALL global devices (multi-host aware): data x model."""
    import jax

    from .mesh import make_mesh

    n = len(jax.devices())
    if n % max(n_model, 1) != 0:
        n_model = 1
    return make_mesh(n // n_model, n_model)


def host_to_global(x, sharding):
    """Place a host (or local device) array onto ``sharding``.

    Works across process boundaries: under a multi-process group each
    process materializes only its addressable shards via the per-index
    callback (``jax.device_put`` of a host-global array does not survive a
    multi-process mesh — the round-2 defect in warm_base.py:64-77).
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def localize(x):
    """Global array -> process-local jnp array (identity single-process).

    Fully-replicated global arrays are read from the local replica;
    sharded ones are merged with one ``process_allgather`` over the group.
    """
    import jax
    import jax.numpy as jnp

    if not isinstance(x, jax.Array) or jax.process_count() == 1:
        return x
    if x.is_fully_addressable:
        return x
    if x.is_fully_replicated:
        return jnp.asarray(np.asarray(x))
    from jax.experimental import multihost_utils

    return jnp.asarray(multihost_utils.process_allgather(x, tiled=True))


def partition_chunks(n_chunks: int):
    """Round-robin chunk indices owned by this process: [pi, pi+pc, ...]."""
    import jax

    pc = jax.process_count()
    pi = jax.process_index()
    return list(range(pi, n_chunks, pc)), pc, pi


def allgather_host(local: np.ndarray) -> np.ndarray:
    """Gather one equal-shape host array per process -> (pc, *shape)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(local))
