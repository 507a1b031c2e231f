"""Decomposition helpers (reference buckler/utils.go).

The per-value functions mirror the reference exactly; the ``*_vec``
variants vectorize the same semantics over whole witness vectors (numpy
int64) so the prover's derived-witness fill is O(len(base)) array passes
instead of O(rank) Python big-int loops (reference buckler/prover.go:77-111
fills them one coefficient at a time)."""

from __future__ import annotations

import numpy as np

from ..fields.spec import DIGIT_BITS


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


def balanced_int64(plain_planes: np.ndarray, spec):
    """Plain digit planes [w, n] -> (balanced int64 values [n], fits [n]).

    The balanced representative xs in (-p/2, p/2] fits int64 whenever
    |xs| < 2^62; ``fits`` flags the (for valid norm-bounded witnesses,
    all) lanes where the fast path is exact.  Semantics match
    decompose_big's balancing: xs = v - p iff v > p >> 1."""
    d = np.asarray(plain_planes).astype(np.uint64)
    w, n = d.shape
    half = spec.p >> 1
    half_d = np.array([(half >> (DIGIT_BITS * j)) & 0xFFFF for j in range(w)],
                      dtype=np.uint64)
    p_d = np.array([(spec.p >> (DIGIT_BITS * j)) & 0xFFFF for j in range(w)],
                   dtype=np.uint64)

    # v > p>>1: multi-digit unsigned compare (lexicographic from the top)
    gt = np.zeros(n, dtype=bool)
    decided = np.zeros(n, dtype=bool)
    for j in reversed(range(w)):
        g = d[j] > half_d[j]
        l = d[j] < half_d[j]
        gt |= g & ~decided
        decided |= (g | l)

    # neg = p - v digitwise (valid where gt; v < p always)
    neg = np.zeros_like(d)
    borrow = np.zeros(n, dtype=np.uint64)
    for j in range(w):
        s = p_d[j] - d[j] - borrow
        neg[j] = s & 0xFFFF
        borrow = (s >> 63) & 1  # wrapped

    mag = np.where(gt[None, :], neg, d)
    # fits: all digits >= 4 zero, and digit 3 < 2^13 (so |xs| < 2^61)
    fits = np.ones(n, dtype=bool)
    for j in range(4, w):
        fits &= mag[j] == 0
    if w > 3:
        fits &= mag[3] < (1 << 13)
    lo = mag[0].astype(np.int64)
    for j in range(1, min(4, w)):
        lo |= mag[j].astype(np.int64) << (DIGIT_BITS * j)
    xs = np.where(gt, -lo, lo)
    return xs, fits


def decompose_big_vec(xs: np.ndarray, base: list[int]) -> np.ndarray:
    """Vectorized decompose_big over balanced int64 values [n]:
    returns digits in {-1, 0, 1} as int64 [len(base), n]."""
    xs = xs.astype(np.int64).copy()
    out = np.zeros((len(base), xs.shape[0]), dtype=np.int64)
    for i, b in enumerate(base):
        if b >= (1 << 62):
            # |xs| < 2^61 (balanced_int64 fits bound), so any base entry
            # this large yields digit 0 — and a Python int >= 2^63 would
            # overflow the int64 comparisons below (huge norm bounds)
            continue
        ge = xs >= b
        le = (~ge) & (xs <= -b)
        out[i] = ge.astype(np.int64) - le.astype(np.int64)
        xs -= b * out[i]
    return out


def ternary_planes(ops, digits: np.ndarray, rank: int) -> np.ndarray:
    """Digits in {-1, 0, 1} (int64 [n], n <= rank) -> [w, rank] value planes
    in the ring's representation (Montgomery on numpy, plain under jax) —
    the vectorized form of ops.from_ints([d % p for d in digits])."""
    tbl = np.stack([np.asarray(ops.from_ints([v]))[:, 0]
                    for v in (-1, 0, 1)], axis=1)  # [w, 3]
    idx = np.ones(rank, dtype=np.int64)  # 1 = the zero-value column
    idx[:digits.shape[0]] = digits + 1
    return np.ascontiguousarray(tbl[:, idx])
