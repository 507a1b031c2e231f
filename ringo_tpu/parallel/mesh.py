"""Device-mesh construction for multi-chip Jindo/Buckler runs.

The reference is a single-process CPU library whose only parallelism is
AVX512 + a goroutine fan-out (SURVEY.md §2.9; jindo/internal/zp/vector.go:
361-406).  The TPU-native scale-out axes are new design:

* ``dp`` — the proof batch (independent commits/openings), the data-parallel
  axis.  Embarrassingly parallel until the batched evaluation combine.
* ``tp`` — RNS prime planes of the commitment rings.  Every ring op is
  plane-local; the one cross-plane contraction is the exact CRT in the
  cutoff step (rings/rns_device.py), which XLA turns into an all-reduce.
* ``sp`` — the MSIS-rank / decomposition axis of the Ajtai products (the
  "output features" of the commit-key matmul), column-parallel style:
  no collectives on the forward MAC.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("dp", "tp", "sp"),
              shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    Without an explicit ``shape``, devices are factored greedily onto the
    axes left-to-right by repeated halving, so e.g. 8 devices with the
    default axes give (2, 2, 2) and 4 give (2, 2, 1).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        dims = [1] * len(axis_names)
        i = 0
        rem = n
        while rem > 1:
            if rem % 2 == 0:
                dims[i % len(dims)] *= 2
                rem //= 2
            else:
                dims[i % len(dims)] *= rem
                rem = 1
            i += 1
        shape = tuple(dims)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    # programs built for this mesh execute on its devices — pin the Pallas
    # gating to the mesh platform (a virtual CPU mesh under an axon/TPU
    # default device must not trace Pallas TPU kernels)
    from .. import backend
    backend.set_target_platform(devices[0].platform)
    return Mesh(np.array(devices).reshape(shape), axis_names)
