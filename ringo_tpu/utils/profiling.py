"""Lightweight observability (the reference has none — SURVEY.md §5; this
is TPU-appropriate tooling, not a port).

* ``span(name)`` — context manager accumulating wall time per name into a
  process-global registry; enabled with RINGO_TRACE=1 (no overhead
  otherwise beyond a dict lookup).
* ``report()`` — dict of {name: (count, total_seconds)}.
* ``device_trace(path)`` — jax.profiler trace wrapper for kernel-level
  inspection in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_ENABLED = bool(os.environ.get("RINGO_TRACE"))
_SPANS: dict[str, list] = defaultdict(lambda: [0, 0.0])


def enabled() -> bool:
    return _ENABLED


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def span(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = _SPANS[name]
        rec[0] += 1
        rec[1] += time.perf_counter() - t0


def report() -> dict[str, tuple[int, float]]:
    return {k: (v[0], v[1]) for k, v in sorted(_SPANS.items())}


def reset():
    _SPANS.clear()


def print_report():  # pragma: no cover — human-facing
    for name, (count, total) in report().items():
        print(f"{name:40s} {count:6d}x  {total:8.3f}s  "
              f"({total / max(count, 1) * 1e3:7.1f} ms avg)")


@contextlib.contextmanager
def device_trace(path: str):  # pragma: no cover — needs a live device
    import jax

    with jax.profiler.trace(path):
        yield
