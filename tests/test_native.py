"""Native C++ kernel vs pure-Python big-int equality.

The verifier silently prefers the native CRT+norm kernel when g++ is
available (jindo/verifier.py _verify_norm), so its bit-exactness against the
RnsReconstructor path is itself a soundness-relevant property — including
the boundary at acc == Q>>1 where balanced representatives flip sign.
"""

import numpy as np
import pytest

from ringo_tpu import native
from ringo_tpu.rings.rns import RnsReconstructor, RnsRing, ntt_friendly_primes

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _ring(L=3, d=64):
    return RnsRing(d, ntt_friendly_primes(30, 2 * d, L))


def _python_norm_sq(ring, polys):
    rec = RnsReconstructor(ring)
    acc = 0
    for poly in polys:
        for v in rec.reconstruct(np.asarray(poly)):
            acc += v * v
    return acc


def test_norm_sq_matches_python_random():
    ring = _ring()
    rng = np.random.default_rng(7)
    res = rng.integers(0, np.array(ring.primes, dtype=np.uint64)[:, None],
                       size=(ring.L, 5 * ring.d), dtype=np.uint64)
    polys = [ring.from_u64(res.reshape(ring.L, 5, ring.d))]
    assert native.norm_sq(ring, polys) == _python_norm_sq(ring, polys)


def test_norm_sq_boundary_residues():
    """Exact +/-Q/2 boundary: values Q//2 - 1, Q//2, Q//2 + 1, Q - 1, 0, 1."""
    ring = _ring(L=2, d=8)
    rec = RnsReconstructor(ring)
    Q = ring.modulus
    vals = [Q // 2 - 1, Q // 2, Q // 2 + 1, Q - 1, 0, 1, Q // 3, 2 * Q // 3]
    poly = rec.set_bigints(vals)
    assert native.norm_sq(ring, [poly]) == _python_norm_sq(ring, [poly])


def test_norm_sq_multiple_param_sets_no_cache_confusion():
    """Different prime chains must not share tables (ADVICE r1: the cache
    was keyed by id(ring), which is reusable after GC)."""
    import gc

    rings = []
    for L in (2, 3):
        ring = _ring(L=L, d=16)
        rng = np.random.default_rng(L)
        res = rng.integers(0, np.array(ring.primes, dtype=np.uint64)[:, None],
                           size=(ring.L, ring.d), dtype=np.uint64)
        poly = ring.from_u64(res.reshape(ring.L, 1, ring.d))
        rings.append((ring, poly, _python_norm_sq(ring, [poly])))
    # interleave with GC churn to exercise cache keying
    for _ in range(3):
        gc.collect()
        for ring, poly, want in rings:
            assert native.norm_sq(ring, [poly]) == want


def test_reconstruct_balanced_matches_python():
    ring = _ring(L=3, d=32)
    rec = RnsReconstructor(ring)
    rng = np.random.default_rng(11)
    res = rng.integers(0, np.array(ring.primes, dtype=np.uint64)[:, None],
                       size=(ring.L, ring.d), dtype=np.uint64)
    poly = ring.from_u64(res.reshape(ring.L, ring.d))
    out = native.reconstruct_balanced(ring, poly)
    assert out is not None
    mag, neg = out
    want = rec.reconstruct(poly)
    for i, v in enumerate(want):
        got = 0
        for j in range(mag.shape[1] - 1, -1, -1):
            got = (got << 64) | int(mag[i, j])
        if neg[i]:
            got = -got
        assert got == v, i
