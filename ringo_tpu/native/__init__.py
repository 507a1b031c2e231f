"""Native host kernels (C++, built on demand with g++).

The TPU path covers the compute-heavy protocol stages; what remains on the
host is exact big-integer work — CRT reconstruction and l2-norm checks in
the verifier (reference verifyNorm, jindo/verifier.go:262-282).  This
package compiles csrc/ringo_native.cpp into a shared library on first use
(cached next to the source) and falls back to the pure-Python path if no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "ringo_native.cpp")
_LIB_PATH = _SRC.replace(".cpp", ".so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                # build to a temp name + atomic rename: another process may
                # be loading (or building) the library concurrently
                tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, _LIB_PATH)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.crt_norm_sq.restype = ctypes.c_int
            lib.crt_norm_sq.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.decode_eval_acc.restype = ctypes.c_int
            lib.decode_eval_acc.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception:  # pragma: no cover — no compiler / build failure
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


class _RingTables:
    def __init__(self, ring):
        Q = ring.modulus
        self.W = -(-Q.bit_length() // 64)
        W = self.W
        self.primes = np.array(ring.primes, dtype=np.uint64)
        self.tinv = np.array(
            [pow((Q // p) % p, -1, p) for p in ring.primes], dtype=np.uint64)
        self.qdiv = np.array(
            [_words(Q // p, W) for p in ring.primes], dtype=np.uint64)
        self.Qw = np.array(_words(Q, W), dtype=np.uint64)
        self.Qhalf = np.array(_words(Q >> 1, W), dtype=np.uint64)


def _words(x: int, w: int) -> list[int]:
    return [(x >> (64 * j)) & 0xFFFFFFFFFFFFFFFF for j in range(w)]


_tables_cache: dict[tuple, _RingTables] = {}


def _tables(ring) -> _RingTables:
    # keyed by the prime chain itself, not id(ring): an id can be reused by
    # a new ring after garbage collection, and these tables feed the
    # soundness-critical norm check
    key = tuple(ring.primes)
    t = _tables_cache.get(key)
    if t is None:
        t = _RingTables(ring)
        _tables_cache[key] = t
    return t


def norm_sq(ring, polys) -> int | None:
    """Exact sum of squared balanced coefficients over a list of plain
    coeff-domain polys [2, L, ..., d].  Returns None if the native library
    is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    t = _tables(ring)
    W = t.W
    acc = np.zeros(2 * W + 2, dtype=np.uint64)
    for poly in polys:
        u = np.ascontiguousarray(ring.to_u64(np.asarray(poly))
                                 .reshape(ring.L, -1))
        n = u.shape[1]
        rc = lib.crt_norm_sq(
            u.ctypes.data, t.primes.size, n,
            t.primes.ctypes.data, t.tinv.ctypes.data, t.qdiv.ctypes.data,
            t.Qw.ctypes.data, t.Qhalf.ctypes.data, W,
            None, None, acc.ctypes.data)
        if rc != 0:  # pragma: no cover
            return None
    out = 0
    for j in range(len(acc) - 1, -1, -1):
        out = (out << 64) | int(acc[j])
    return out


def decode_eval(ring, partials, p: int, base: int, exp: int, slots: int,
                right: list[int]) -> int | None:
    """The verifier's decoded-evaluation sum (reference verifyEval,
    jindo/verifier.go:224-259): reconstruct + base-b decode every partial
    column and return sum_{i,s} right[i*slots+s] * decode(partial_i)[s]
    mod p.  ``partials`` are plain coeff-domain planes [2, L, cols, d].
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = _tables(ring)
    W = t.W
    u = np.ascontiguousarray(ring.to_u64(np.asarray(partials))
                             .reshape(ring.L, -1))
    cols = partials.shape[-2]
    d = partials.shape[-1]
    Wp = -(-p.bit_length() // 64)
    WA = W + 2 * Wp + 3
    bpow = np.array([_words(pow(base, j, p), Wp) for j in range(exp)],
                    dtype=np.uint64)
    rw = np.array([_words(v % p, Wp) for v in right[:cols * slots]],
                  dtype=np.uint64)
    acc_pos = np.zeros(WA, dtype=np.uint64)
    acc_neg = np.zeros(WA, dtype=np.uint64)
    rc = lib.decode_eval_acc(
        u.ctypes.data, t.primes.size, cols, d,
        t.primes.ctypes.data, t.tinv.ctypes.data, t.qdiv.ctypes.data,
        t.Qw.ctypes.data, t.Qhalf.ctypes.data, W,
        bpow.ctypes.data, exp, Wp, slots,
        rw.ctypes.data, acc_pos.ctypes.data, acc_neg.ctypes.data, WA)
    if rc != 0:  # pragma: no cover
        return None

    def _to_int(a):
        out = 0
        for j in range(len(a) - 1, -1, -1):
            out = (out << 64) | int(a[j])
        return out

    return (_to_int(acc_pos) - _to_int(acc_neg)) % p


def reconstruct_balanced(ring, poly):
    """Balanced reconstruction as (magnitude words [n, W] u64, neg [n] u8),
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = _tables(ring)
    W = t.W
    u = np.ascontiguousarray(ring.to_u64(np.asarray(poly)).reshape(ring.L, -1))
    n = u.shape[1]
    mag = np.zeros((n, W), dtype=np.uint64)
    neg = np.zeros(n, dtype=np.uint8)
    acc = np.zeros(2 * W + 2, dtype=np.uint64)
    rc = lib.crt_norm_sq(
        u.ctypes.data, t.primes.size, n,
        t.primes.ctypes.data, t.tinv.ctypes.data, t.qdiv.ctypes.data,
        t.Qw.ctypes.data, t.Qhalf.ctypes.data, W,
        mag.ctypes.data, neg.ctypes.data, acc.ctypes.data)
    if rc != 0:  # pragma: no cover
        return None
    return mag, neg
