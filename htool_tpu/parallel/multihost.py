"""Multi-host execution — the MPI-multi-node analog (SURVEY.md §5).

The reference scales across nodes with plain MPI ranks; the TPU-native
equivalent is one JAX process per host with a GLOBAL mesh over the pod
slice: ``jax.distributed.initialize`` wires the processes together, every
collective in the package (psum / all_gather / ppermute under shard_map)
then rides ICI within a slice and DCN across slices with no code changes —
shard_map programs are written against the global mesh regardless of how
many processes back it.

This module provides the process-setup helpers; the operators and solvers
are already mesh-global.  On a single host (or under the CPU-emulated
mesh) everything degrades to the local device list.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize_multihost", "global_mesh", "is_multihost"]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Wire up multi-process JAX (the MPI_Init analog).

    With no arguments, relies on the TPU pod environment auto-detection
    (``jax.distributed.initialize()``); explicit arguments support
    CPU/GPU clusters.  Safe to call when already initialized or when
    running single-process (no coordinator configured): those cases are
    no-ops.

    Must run before any backend use: probing ``jax.process_count()`` (or
    touching any array) initializes the local backend and silently breaks
    ``jax.distributed.initialize`` — hence the client check below."""
    if jax.distributed.is_initialized():
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "TPU_WORKER_HOSTNAMES"
        ):
            jax.distributed.initialize()
        # else: single-process — nothing to do
    except RuntimeError:
        # double-initialize or non-distributed environment
        pass


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_mesh(axis_name: str = "p", devices=None) -> Mesh:
    """1-D mesh over ALL devices of ALL processes (``jax.devices()`` is
    global after ``initialize_multihost``) — the communicator the
    row-partitioned operator shards over.  Build the cluster tree with
    ``n_partitions = mesh.devices.size``."""
    devs = np.array(jax.devices() if devices is None else devices)
    return Mesh(devs, (axis_name,))
