"""Multi-host plumbing: jax.distributed over DCN + process-0 Fiat-Shamir.

The reference is single-process (SURVEY.md §2.9); scaling a prove past one
host needs exactly two pieces beyond the dp/tp/sp shardings (which GSPMD
lowers to ICI/DCN collectives by itself):

1. **Runtime init** — every host calls :func:`init_multihost` before any
   jax call; afterwards ``jax.devices()`` is the global device list and
   `make_mesh(len(jax.devices()))` spans the slice.
2. **One transcript** — Fiat-Shamir is inherently sequential host work.
   The convention here (SURVEY §5): process 0 owns the oracle; every
   challenge it derives is broadcast with :func:`bcast_bytes` so all hosts
   drive their (identical) device programs with identical constants.
   Commit digests are replicated outputs, so process 0 sees the same bytes
   to bind without extra communication.

Single-process degenerates to no-ops — covered by tests/test_parallel.py.
"""

from __future__ import annotations

import os

import numpy as np


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Initialize jax.distributed from args or the standard environment
    variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID; TPU pods auto-detect all three).  Returns this
    process's index.  No-op (returns 0) for a single process."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes in (None, 1):
        return 0  # single process — nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def bcast_bytes(data: bytes | None, length: int) -> bytes:
    """Broadcast a byte string (challenge, CRS, commitment digest) from
    process 0 to every host.  Non-zero processes pass ``data=None`` (their
    value is ignored); all processes pass the same ``length``.  Identity
    on a single process."""
    import jax

    if jax.process_count() == 1:
        assert data is not None
        return data

    from jax.experimental import multihost_utils

    buf = np.zeros(length, dtype=np.uint8)
    if jax.process_index() == 0:
        if data is None or len(data) != length:
            raise ValueError("process 0 must supply `length` bytes")
        buf[:] = np.frombuffer(data, dtype=np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out))


def sync_global_devices(tag: str = "ringo") -> None:
    """Barrier across hosts (no-op single-process)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
