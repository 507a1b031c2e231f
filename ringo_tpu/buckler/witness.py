"""Circuit / witness API (reference buckler/witness.go, compile.go walker).

Instead of Go's reflection over struct fields, circuits are plain Python
objects: declare ``Witness()`` / ``PublicWitness()`` markers as attributes (or
inside lists/tuples/dicts), implement ``define(ctx)``, and compile walks the
instance in deterministic attribute order to assign IDs.  For proving, build a
second instance of the same class whose marker positions hold value arrays
(digit planes [w, rank] in Montgomery form, or lists of ints)."""

from __future__ import annotations

import numpy as np


class Witness:
    """Secret witness marker; compile assigns .id."""

    def __init__(self):
        self.id: int | None = None


class PublicWitness:
    """Public witness marker; compile assigns .id."""

    def __init__(self):
        self.id: int | None = None


class Circuit:
    """Base class for circuits; subclasses implement define(ctx)."""

    def define(self, ctx):  # pragma: no cover - interface
        raise NotImplementedError


def walk(obj, path=(), _seen=None):
    """Deterministic traversal yielding (path, leaf) for every Witness /
    PublicWitness marker position.  Mirrors the reference's reflect walker
    (compile.go:49-86) over attributes, sequences and dicts."""
    if _seen is None:
        _seen = set()
    if isinstance(obj, (Witness, PublicWitness)):
        yield path, obj
        return
    if isinstance(obj, dict):
        for k in sorted(obj):
            yield from walk(obj[k], path + (("key", k),), _seen)
        return
    if isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            yield from walk(v, path + (("idx", i),), _seen)
        return
    if hasattr(obj, "__dict__") and not isinstance(obj, np.ndarray):
        if id(obj) in _seen:
            return
        _seen.add(id(obj))
        for name, v in vars(obj).items():
            yield from walk(v, path + (("attr", name),), _seen)
        return


def walk_markers(circuit):
    """Yield (path, marker) for each Witness/PublicWitness marker."""
    for path, leaf in walk(circuit):
        if isinstance(leaf, (Witness, PublicWitness)):
            yield path, leaf


def get_path(obj, path):
    for kind, key in path:
        if kind == "attr":
            obj = getattr(obj, key)
        else:
            obj = obj[key]
    return obj
