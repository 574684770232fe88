"""Multi-host initialization (DCN) — the layer the reference never had
(single process, single device; SURVEY.md §5 "comm backend").

On a multi-host TPU pod slice, call ``init_distributed()`` once per process
before building meshes: JAX then exposes every chip in ``jax.devices()`` and
the shard_map/psum code in this package runs unchanged, with in-host
collectives on ICI and cross-host on DCN.  On single-host (or already-
initialized) environments this is a no-op, so all entry points can call it
unconditionally.
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Returns True if distributed mode is active.  Env fallbacks:
    JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID (also the
    standard TPU pod metadata when running on Cloud TPU, which
    jax.distributed.initialize() discovers on its own).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)

    if coordinator_address is None and num_processes is None:
        return False  # single-host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except RuntimeError as e:  # already initialized
        if "already" in str(e).lower():
            return True
        raise


def is_multi_host() -> bool:
    return jax.process_count() > 1
