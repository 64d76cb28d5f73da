"""Multi-host (pod-slice) initialization.

Single-host multi-chip needs nothing: ``jax.devices()`` sees all local chips
and the spatial mesh in ``mesh.py`` spans them over ICI. On a multi-host pod
slice (e.g. v5e-16+), call :func:`initialize` once per process before any
JAX computation; afterwards ``jax.devices()`` returns the global device list
and the same mesh/sharding code runs unchanged — GSPMD keeps conv halo
exchanges on ICI, and only unavoidable cross-host collectives ride DCN.

Tested two ways (tests/test_multihost.py): the single-host no-op path, and
a real 2-process ``jax.distributed`` bootstrap on localhost CPU running a
cross-host psum over the spatial mesh.
"""

import os

import jax

__all__ = ["initialize", "is_multihost", "local_device_count"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). A no-op
    for single-process runs (the common case on one host)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False  # single host — nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=(
            num_processes
            if num_processes is not None
            else int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        ),
        process_id=(
            process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0"))
        ),
    )
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_device_count() -> int:
    return jax.local_device_count()
