"""Decomposition helpers (reference buckler/utils.go)."""

from __future__ import annotations


def decompose_base(x: int) -> list[int]:
    """Halving ternary-friendly base for a norm bound
    (reference decomposeBase, utils.go:7-33)."""
    dcmp_len = x.bit_length()
    if x & (x - 1) == 0:  # power of two
        dcmp_len -= 1
    base = [0] * dcmp_len
    for i in range(dcmp_len - 1):
        s = sum(base[:i])
        b = x - s
        base[i] = (b >> 1) + (b & 1)
    base[dcmp_len - 1] = 1
    return base


def decompose_big(x: int, base: list[int], q: int) -> list[int]:
    """Signed greedy decomposition of a balanced representative into digits
    in {-1, 0, 1} against ``base`` (reference decomposeBig, utils.go:35-56)."""
    xs = x % q
    if xs > q >> 1:
        xs -= q
    out = [0] * len(base)
    for i, b in enumerate(base):
        if xs >= b:
            out[i] = 1
            xs -= b
        elif xs <= -b:
            out[i] = -1
            xs += b
    return out
