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


def _py_reconstruct(ring, poly):
    """Independent pure-Python CRT (bypasses the native fast path that
    RnsReconstructor.reconstruct itself prefers)."""
    u = ring.to_u64(np.asarray(poly)).reshape(ring.L, -1)
    Q = ring.modulus
    gad = [(Q // p) * pow((Q // p) % p, -1, p) % Q for p in ring.primes]
    out = []
    for i in range(u.shape[1]):
        acc = sum(int(u[l, i]) * gad[l] for l in range(ring.L)) % Q
        # balanced convention: acc >= Q>>1 goes negative (rns.go semantics,
        # matching RnsReconstructor.reconstruct and the C++ kernel)
        out.append(acc - Q if acc >= Q >> 1 else acc)
    return out


def _python_norm_sq(ring, polys):
    acc = 0
    for poly in polys:
        for v in _py_reconstruct(ring, poly):
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
    want = _py_reconstruct(ring, poly)
    for i, v in enumerate(want):
        got = 0
        for j in range(mag.shape[1] - 1, -1, -1):
            got = (got << 64) | int(mag[i, j])
        if neg[i]:
            got = -got
        assert got == v, i


def test_basis_extender_lift_native_matches_python():
    from ringo_tpu.rings.rns import BasisExtender
    from ringo_tpu import native as nat

    src = _ring(L=2, d=32)
    dst = _ring(L=3, d=32)
    ext = BasisExtender(src, dst)
    rng = np.random.default_rng(5)
    res = rng.integers(0, np.array(src.primes, dtype=np.uint64)[:, None],
                       size=(src.L, src.d), dtype=np.uint64)
    poly = src.from_u64(res.reshape(src.L, src.d))
    got = ext.lift(poly)
    # pure-python reference
    vals = _py_reconstruct(src, poly)
    want = np.zeros((dst.L, len(vals)), dtype=np.uint64)
    for l, p in enumerate(dst.primes):
        want[l] = np.array([v % p for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, dst.from_u64(want))


def test_basis_extender_lift_boundary():
    """Values at +/-Q/2 and 0 lift consistently through the native path."""
    from ringo_tpu.rings.rns import BasisExtender, RnsReconstructor

    src = _ring(L=2, d=8)
    dst = _ring(L=3, d=8)
    ext = BasisExtender(src, dst)
    rec = RnsReconstructor(src)
    Q = src.modulus
    vals = [Q // 2, Q // 2 + 1, Q - 1, 0, 1, Q // 2 - 1, 2, Q - 2]
    poly = rec.set_bigints(vals)
    got = ext.lift(poly)
    balanced = _py_reconstruct(src, poly)
    want = np.zeros((dst.L, len(vals)), dtype=np.uint64)
    for l, p in enumerate(dst.primes):
        want[l] = np.array([v % p for v in balanced], dtype=np.uint64)
    np.testing.assert_array_equal(got, dst.from_u64(want))


def test_decode_eval_matches_python():
    """Native decode_eval_acc equals the Python decode + weighted-sum loop."""
    import random

    from ringo_tpu import jindo
    from ringo_tpu.fields import ZP110
    from ringo_tpu.jindo.challenge import right_vec

    if not native.available():
        pytest.skip("no compiler")
    params = jindo.new_parameters(ZP110, 1 << 8, 1)
    p = params
    ring = p.ring_q
    rng = np.random.default_rng(17)
    # random plain coeff-domain partials [2, L, cols, d]
    res = np.stack([rng.integers(0, q, (p.cols, p.degree), dtype=np.uint64)
                    for q in ring.primes])
    partials = ring.from_u64(res)
    x = random.Random(5).randrange(ZP110.p)
    right = right_vec(p, x)

    got = native.decode_eval(ring, partials, ZP110.p, p.base, p.exp,
                             p.slots, right)

    from ringo_tpu.jindo.encoder import Encoder
    ecd = Encoder(params)
    want = 0
    for i in range(p.cols):
        dcd = ecd.decode(partials[:, :, i, :])
        for j in range(p.slots):
            want = (want + right[i * p.slots + j] * dcd[j]) % ZP110.p
    assert got == want
