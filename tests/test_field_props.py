"""Field-layer property suite: every FieldOps method at every reference
modulus, randomized algebraic laws vs Python big ints plus the edge cases
the reference's gopter suites pin (zero, +-1, p-1, non-residues; reference
jindo/internal/zp/element_test.go:267-290, vector_test.go:21-50 — ~2,850
LoC of generated property tests per modulus, covered here by one
parameterized file because the engine is generic over FieldSpec)."""

import numpy as np
import pytest

from ringo_tpu.fields import FieldOps, limb
from ringo_tpu.fields.spec import REFERENCE_FIELDS

SPECS = sorted(REFERENCE_FIELDS)


def _vals(spec, rng, n=10):
    """Random field values plus the canonical edge cases."""
    edge = [0, 1, 2, spec.p - 1, (spec.p + 1) // 2, spec.p >> 1]
    rnd = [int.from_bytes(rng.bytes((spec.bits + 7) // 8 + 4), "little")
           % spec.p for _ in range(n)]
    return edge + rnd


@pytest.fixture(scope="module", params=SPECS)
def F(request):
    spec = REFERENCE_FIELDS[request.param]
    return spec, FieldOps(spec), np.random.default_rng(
        abs(hash(request.param)) % (1 << 32))


def test_roundtrip_and_consts(F):
    spec, ops, rng = F
    vals = _vals(spec, rng)
    a = ops.from_ints(vals)
    assert ops.to_ints(a) == vals
    assert ops.to_int(ops.from_int(vals[4]).reshape(spec.w, 1)) == vals[4]
    assert ops.to_ints(ops.const(7, (3,))) == [7, 7, 7]
    assert ops.to_ints(ops.zeros((2,))) == [0, 0]


def test_ring_laws(F):
    spec, ops, rng = F
    p = spec.p
    va, vb = _vals(spec, rng), list(reversed(_vals(spec, rng)))
    a, b = ops.from_ints(va), ops.from_ints(vb)
    assert ops.to_ints(ops.add(a, b)) == [(x + y) % p for x, y in zip(va, vb)]
    assert ops.to_ints(ops.sub(a, b)) == [(x - y) % p for x, y in zip(va, vb)]
    assert ops.to_ints(ops.neg(a)) == [(-x) % p for x in va]
    assert ops.to_ints(ops.mul(a, b)) == [x * y % p for x, y in zip(va, vb)]
    assert ops.to_ints(ops.double(a)) == [2 * x % p for x in va]
    # commutativity / distributivity spot checks
    np.testing.assert_array_equal(ops.mul(a, b), ops.mul(b, a))
    np.testing.assert_array_equal(
        ops.mul(a, ops.add(b, b)),
        ops.add(ops.mul(a, b), ops.mul(a, b)))


def test_halve_and_small_muls(F):
    spec, ops, rng = F
    p = spec.p
    vals = _vals(spec, rng)
    a = ops.from_ints(vals)
    inv2 = pow(2, p - 2, p)
    assert ops.to_ints(ops.halve(a)) == [v * inv2 % p for v in vals]
    np.testing.assert_array_equal(ops.halve(ops.double(a)), a)
    assert ops.to_ints(ops.mul_by_3(a)) == [3 * v % p for v in vals]
    assert ops.to_ints(ops.mul_by_5(a)) == [5 * v % p for v in vals]
    assert ops.to_ints(ops.mul_by_13(a)) == [13 * v % p for v in vals]


def test_predicates_and_order(F):
    spec, ops, rng = F
    vals = _vals(spec, rng)
    a = ops.from_ints(vals)
    assert list(np.asarray(ops.is_zero(a))) == [v == 0 for v in vals]
    b = ops.from_ints(list(reversed(vals)))
    assert list(np.asarray(ops.eq(a, b))) == \
        [x == y for x, y in zip(vals, reversed(vals))]
    # cmp on canonical (non-Montgomery) planes gives value order
    ca = ops.from_mont(a)
    cb = ops.from_mont(b)
    want = [(x > y) - (x < y) for x, y in zip(vals, reversed(vals))]
    assert list(np.asarray(limb.cmp(ca, cb))) == want
    assert list(np.asarray(ops.bit_len(a))) == [v.bit_length() for v in vals]
    sel = ops.select(np.asarray([v % 2 == 0 for v in vals]), a, b)
    assert ops.to_ints(sel) == [x if x % 2 == 0 else y
                                for x, y in zip(vals, reversed(vals))]


def test_exp_inverse_batch_invert(F):
    spec, ops, rng = F
    p = spec.p
    vals = _vals(spec, rng, n=4)
    a = ops.from_ints(vals)
    e = int.from_bytes(rng.bytes(9), "little")
    assert ops.to_ints(ops.exp(a, e)) == [pow(v, e, p) for v in vals]
    assert ops.to_ints(ops.exp(a, 0)) == [1] * len(vals)
    inv = ops.inverse(a)
    assert ops.to_ints(inv) == [pow(v, p - 2, p) for v in vals]  # 0 -> 0
    binv = ops.batch_invert(a)
    np.testing.assert_array_equal(binv, inv)
    # all-zero batch stays zero
    z = ops.zeros((3,))
    np.testing.assert_array_equal(ops.batch_invert(z), z)


def test_legendre_and_sqrt(F):
    spec, ops, rng = F
    p = spec.p
    base = _vals(spec, rng, n=4)
    squares = [v * v % p for v in base]
    # deterministic non-residue
    znr = 2
    while pow(znr, (p - 1) // 2, p) != p - 1:
        znr += 1
    nonres = [znr * s % p for s in squares if s != 0][:2]
    vals = squares + nonres + [0]
    a = ops.from_ints(vals)
    leg = ops.to_ints(ops.legendre(a))
    assert leg == [pow(v, (p - 1) // 2, p) for v in vals]
    root, ok = ops.sqrt(a)
    ok = np.asarray(ok)
    want_ok = [v == 0 or pow(v, (p - 1) // 2, p) == 1 for v in vals]
    assert list(ok) == want_ok
    r2 = ops.to_ints(ops.mul(root, root))
    for v, w_ok, rr in zip(vals, want_ok, r2):
        if w_ok:
            assert rr == v


def test_marshal_vector_roundtrip(F):
    spec, ops, rng = F
    vals = _vals(spec, rng)
    a = ops.from_ints(vals)
    blob = ops.marshal_vector(a)
    assert len(blob) == 8 + len(vals) * ((spec.bits + 7) // 8)
    back = ops.unmarshal_vector(blob)
    np.testing.assert_array_equal(back, a)


def test_mont_form_involution(F):
    spec, ops, rng = F
    vals = _vals(spec, rng)
    plain = limb.ints_to_digits(vals, spec.w)
    np.testing.assert_array_equal(ops.from_mont(ops.to_mont(plain)), plain)


def test_beyond_reference_1100_bit_modulus():
    """North-star coverage (>1000-bit modulus, BASELINE.md): the generic
    engine serves a freshly searched 1100-bit jindo-friendly field —
    field ops vs Python ints and an end-to-end cyclic NTT multiply."""
    from ringo_tpu.fields.spec import find_modulus
    from ringo_tpu.rings.bigring import CyclicRing

    spec = find_modulus(1100, 1200)
    assert spec.p.bit_length() > 1000
    ops = FieldOps(spec)
    rng = np.random.default_rng(7)
    vals = _vals(spec, rng, n=4)
    a = ops.from_ints(vals)
    b = ops.from_ints(list(reversed(vals)))
    assert ops.to_ints(ops.mul(a, b)) == \
        [x * y % spec.p for x, y in zip(vals, reversed(vals))]
    assert ops.to_ints(ops.inverse(a))[1] == pow(vals[1], spec.p - 2, spec.p)

    n = 32
    ring = CyclicRing(spec, n, plain=False)
    pa = ring.from_ints([rng.integers(0, 1 << 62) for _ in range(n)])
    pb = ring.from_ints([rng.integers(0, 1 << 62) for _ in range(n)])
    got = ring.to_ints(ring.intt(ring.mul(ring.ntt(pa), ring.ntt(pb))))
    av, bv = ring.to_ints(pa), ring.to_ints(pb)
    want = [0] * n
    for i in range(n):
        for j in range(n):
            want[(i + j) % n] = (want[(i + j) % n] + av[i] * bv[j]) % spec.p
    assert got == want
