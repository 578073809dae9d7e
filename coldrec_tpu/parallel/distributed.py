"""Multi-host process-group initialization (SURVEY §5.8).

One thin entry point owns ``jax.distributed.initialize`` so the rest of the
framework never touches process-group plumbing: collectives compile over ICI
within a slice and DCN across slices automatically once the mesh spans all
global devices.

Single-host (this environment) is a no-op; multi-host pods initialize from
the standard env (COORDINATOR_ADDRESS / TPU metadata) or explicit args.
"""
from __future__ import annotations

import os
from typing import Optional

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

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def global_mesh(n_model: int = 1):
    """Mesh over ALL global devices (multi-host aware): data x model."""
    import jax

    from .mesh import make_mesh

    n = len(jax.devices())
    if n % max(n_model, 1) != 0:
        n_model = 1
    return make_mesh(n // n_model, n_model)
