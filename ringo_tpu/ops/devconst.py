"""Keep big precomputed tables out of traced HLO programs.

Table-driven kernels (the matmul NTT maps, the twin-CDT byte planes) hold
their tables as numpy arrays on the owning object; traced code that uses
them would bake each table into the StableHLO module as an inline constant.
At the Jindo commit shapes that inflates one program to ~30 MB of IR —
which the axon TPU tunnel then compiles and uploads per program, turning
every cold start into minutes (round-4 BENCH: a 1441 s "compile").

The fix is to pass the tables as jit ARGUMENTS instead: the executable
stays small and the table bytes move to the device once per process as
ordinary arrays.  This module is the plumbing:

* ``register(owner, name, arr)`` — called at table build time with the
  numpy array; returns ``arr``.
* ``get(owner, name)`` — called from traced kernel code.  Returns the
  installed override (a traced jit argument) when one is active, the
  registered numpy array otherwise — so unwrapped callers (numpy backend,
  shard_map builders that want inline constants) keep working unchanged.
* ``wrap(fn, owners, jit, dev_tables)`` — wraps a stage function so its
  jitted form takes the table pytree as a leading argument and installs
  the overrides for the duration of the trace; the returned callable has
  the original signature (the table argument is supplied automatically).
* ``device_tables(owners, to_device)`` — snapshot the owners' registered
  tables as device arrays, in a pytree matching ``installed``'s layout.

Single-threaded tracing is assumed (jax traces synchronously on the
calling thread), so a plain dict is enough for the active-override map.
"""

from __future__ import annotations

import contextlib

_TABLES: dict[int, dict[str, object]] = {}   # id(owner) -> {name: np array}
_ACTIVE: dict[tuple[int, str], object] = {}  # (id(owner), name) -> override


def register(owner, name: str, arr):
    _TABLES.setdefault(id(owner), {})[name] = arr
    return arr


def get(owner, name: str):
    ov = _ACTIVE.get((id(owner), name))
    if ov is not None:
        return ov
    return _TABLES[id(owner)][name]


def tables_of(owner) -> dict:
    return dict(_TABLES.get(id(owner), {}))


@contextlib.contextmanager
def installed(owners, tables):
    """tables: sequence of {name: array} aligned with owners."""
    keys = []
    for ow, tab in zip(owners, tables):
        for name, arr in tab.items():
            _ACTIVE[(id(ow), name)] = arr
            keys.append((id(ow), name))
    try:
        yield
    finally:
        for k in keys:
            _ACTIVE.pop(k, None)


def device_tables(owners, to_device):
    return [{n: to_device(a) for n, a in _TABLES.get(id(ow), {}).items()}
            for ow in owners]


def wrap(fn, owners, jit, dev_tables_fn):
    """jit ``fn`` with the owners' tables as a hidden leading argument.

    ``dev_tables_fn()`` is called at each invocation to supply the device
    table pytree (cache it — the arrays are device-resident and reused)."""
    def run(tables, *args):
        with installed(owners, tables):
            return fn(*args)

    # keep the original stage name on the compiled program (cache entries
    # and profiles stay identifiable)
    run.__name__ = getattr(fn, "__name__", "run")
    run.__qualname__ = run.__name__
    jfn = jit(run)

    def call(*args):
        # Under an enclosing trace (another wrapped stage, a shard_map
        # builder), run the raw fn inline: calling the jitted form there
        # would pass the CONCRETE device tables into the outer trace and
        # re-inline them as constants — exactly what this module removes.
        # The enclosing wrap's installed overrides (or the numpy defaults)
        # apply instead.
        try:
            from jax._src import core as _core
            clean = _core.trace_state_clean()
        except Exception:  # pragma: no cover
            clean = True
        if not clean:
            return fn(*args)
        return jfn(dev_tables_fn(), *args)

    call.__wrapped_raw__ = fn
    return call
