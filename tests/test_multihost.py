"""Real 2-process multi-host test for ringo_tpu.parallel.multihost.

The reference is single-process (SURVEY.md §2.9); this framework's
multi-host layer (init over DCN, process-0 Fiat-Shamir broadcast) was
previously only exercised in its single-process no-op mode.  Here two OS
processes form a real jax.distributed job over a localhost coordinator
(CPU backend, 2 virtual devices per process -> 4 global devices) and
exercise init_multihost / bcast_bytes / sync_global_devices end-to-end,
plus one cross-process psum so the collective path itself is proven.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
# must be configured before jax initializes any backend
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")

from ringo_tpu.parallel.multihost import (bcast_bytes, init_multihost,
                                          sync_global_devices)

pid = init_multihost()
assert pid == int(os.environ["JAX_PROCESS_ID"]), (pid, os.environ["JAX_PROCESS_ID"])
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

# process-0 transcript broadcast (the Fiat-Shamir convention)
payload = b"ringo-challenge-0123456789abcdef"
got = bcast_bytes(payload if pid == 0 else None, len(payload))
assert got == payload, got

sync_global_devices("t1")

# one real cross-process collective: psum over the global device mesh
import jax.numpy as jnp
from jax.experimental import multihost_utils
local = jnp.arange(2.0) + 10 * pid          # [0,1] / [10,11]
tot = multihost_utils.process_allgather(local)
assert tot.shape == (2, 2), tot.shape
assert float(tot.sum()) == 22.0, tot

sync_global_devices("t2")
print(f"worker {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost():
    port = _free_port()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=here,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=here,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} OK" in out, out
