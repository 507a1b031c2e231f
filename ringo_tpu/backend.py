"""Backend selection: numpy (host, default for tests) or jax (TPU).

The limb kernels dispatch on array type, so switching backends is a matter of
where arrays live and whether stage functions are jitted.  Protocol code calls
``stage = backend.jit(fn)`` once per shape and moves data with
``to_device`` / ``to_host`` at stage boundaries.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import jax
    import jax.numpy as jnp

    # exact wide arithmetic needs int64/uint64 intermediates (divmod by the
    # encoding base); all dtypes in this library are explicit.
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    jax = None
    jnp = None

_BACKEND = os.environ.get("RINGO_BACKEND", "numpy")


def use(name: str):
    global _BACKEND
    if name not in ("numpy", "jax"):
        raise ValueError(name)
    if name == "jax" and jax is None:
        raise RuntimeError("jax not available")
    _BACKEND = name


def current() -> str:
    return _BACKEND


def is_jax() -> bool:
    return _BACKEND == "jax"


def to_device(x):
    if _BACKEND == "jax":
        return jnp.asarray(x)
    return np.asarray(x)


def to_host(x) -> np.ndarray:
    return np.asarray(x)


def jit(fn, **kwargs):
    if _BACKEND == "jax":
        return jax.jit(fn, **kwargs)
    return fn


def block(x):
    """Wait for async device work (no-op on numpy)."""
    if _BACKEND == "jax" and hasattr(x, "block_until_ready"):
        x.block_until_ready()
    return x


class DeviceCache:
    """Memoized host->device copies keyed by array object identity.

    The axon tunnel moves host data at ~30 MB/s, so re-uploading the same
    witness/proof tensors on every call dominates wall time (a 17 MB
    witness costs ~600 ms per commit at N=2^19 — the Go reference pays
    zero transfer for the same repeated-bench pattern).  Arrays handed to
    the library are treated as immutable; a weakref guards against id()
    reuse after deallocation.  ``cap`` bounds resident device copies."""

    def __init__(self, cap: int = 8):
        self.cap = cap
        self._d: dict[int, tuple] = {}

    def get(self, arr, put):
        key = id(arr)
        rec = self._d.get(key)
        if rec is not None and rec[0]() is arr:
            return rec[1]
        val = put(arr)
        import weakref

        try:
            ref = weakref.ref(arr, lambda _: self._d.pop(key, None))
        except TypeError:  # pragma: no cover — non-weakref-able input
            ref = (lambda a: (lambda: a))(arr)
        if len(self._d) >= self.cap:
            self._d.clear()
        self._d[key] = (ref, val)
        return val


_TARGET_PLATFORM: str | None = None


def set_target_platform(platform: str | None):
    """Pin the platform traced programs will execute on ('tpu'/'cpu'), or
    None for auto-detect from the default device.  The parallel builders
    set 'cpu' for virtual CPU meshes: the default device may still be a
    TPU (the axon sitecustomize pins it even under JAX_PLATFORMS=cpu), and
    Pallas TPU kernels must not be traced into CPU-mesh programs."""
    global _TARGET_PLATFORM
    _TARGET_PLATFORM = platform


def use_pallas() -> bool:
    """True when traced code should emit Pallas TPU kernels (chacha
    keystream, twin-CDT search)."""
    if os.environ.get("RINGO_NO_PALLAS"):
        return False
    if _TARGET_PLATFORM is not None:
        return _TARGET_PLATFORM == "tpu"
    if jax is None:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
