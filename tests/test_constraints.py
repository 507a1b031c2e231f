"""Coverage of the full constraint suite (reference README TODO checklist):
sumcheck, squared two-norm, approximate inf-norm (modular J-L, second-round
witnesses), automorphism and recomposition checkers.

NOTE: the reference stores sumcheck target sums (context.go:85-94) but never
reads them — the univariate sumcheck identity (verifier.go:296-315) proves the
subgroup sum is exactly 0.  We are bug-compatible, so sumcheck tests use
zero-sum witnesses.
"""

import random

import numpy as np
import pytest

from ringo_tpu import buckler
from ringo_tpu.fields import ZP220
from ringo_tpu.rings.bigring import CyclotomicRing

CRS = b"Constraints!"
N = 1 << 8


class SumTwoNormCircuit:
    """x with zero subgroup sum, squared two-norm bound, and an
    automorphism constraint y = Aut_5(x)."""

    def __init__(self):
        self.aut = None
        self.x = buckler.Witness()
        self.y = buckler.Witness()

    def define(self, ctx):
        c = buckler.ArithmeticConstraint()
        c.add_term(1, None, self.x)
        ctx.add_sum_check_constraint(c, 0)
        ctx.add_sq_two_norm_constraint(self.x, 4 * N)
        ctx.add_linear_constraint(self.y, self.x, self.aut)


class SumAssign:
    def __init__(self, x, y):
        self.aut = None
        self.x = x
        self.y = y


def _zero_sum_ternary(rng, spec):
    xs = [rng.randrange(3) - 1 for _ in range(N)]
    xs[-1] = (-sum(xs[:-1])) % spec.p
    # keep it small for the two-norm bound: resample until the fixup is tiny
    while xs[-1] not in (0, 1, spec.p - 1):
        xs = [rng.randrange(3) - 1 for _ in range(N)]
        xs[-1] = (-sum(xs[:-1])) % spec.p
    return xs


def test_sumcheck_twonorm_aut():
    rng = random.Random(200)
    spec = ZP220
    ring = CyclotomicRing(spec, N)
    xs = _zero_sum_ternary(rng, spec)
    x = ring.from_ints(xs)
    y = ring.aut(x, 5)

    c = SumTwoNormCircuit()
    c.aut = buckler.AutChecker(ring, 5, is_ntt=False)
    prv, vrf = buckler.compile_circuit(spec, N, c, CRS, seed=b"s1")

    a = SumAssign(x.coeffs, y.coeffs)
    pf = prv.prove(a)
    assert vrf.verify(a, pf)

    # wrong automorphism index in the witness must fail
    y_bad = ring.aut(x, 7)
    a_bad = SumAssign(x.coeffs, y_bad.coeffs)
    pf_bad = prv.prove(a_bad)
    assert not vrf.verify(a_bad, pf_bad)


def test_sumcheck_nonzero_sum_fails():
    rng = random.Random(202)
    spec = ZP220
    ring = CyclotomicRing(spec, N)
    xs = _zero_sum_ternary(rng, spec)
    xs[0] = (xs[0] + 1) % spec.p  # break the zero sum
    x = ring.from_ints(xs)
    y = ring.aut(x, 5)

    c = SumTwoNormCircuit()
    c.aut = buckler.AutChecker(ring, 5, is_ntt=False)
    prv, vrf = buckler.compile_circuit(spec, N, c, CRS, seed=b"s3")
    a = SumAssign(x.coeffs, y.coeffs)
    pf = prv.prove(a)
    assert not vrf.verify(a, pf)


class ApproxNormCircuit:
    def __init__(self):
        self.x = buckler.Witness()

    def define(self, ctx):
        ctx.add_approx_inf_norm_constraint(self.x, 8)


class ApproxAssign:
    def __init__(self, x):
        self.x = x


def test_approx_inf_norm():
    # needs rank >= 128 * len(decompose_base(rank * bound)) like the reference
    n = 1 << 11
    rng = random.Random(201)
    spec = ZP220
    ring = CyclotomicRing(spec, n)
    xs = [rng.randrange(17) - 8 for _ in range(n)]
    x = ring.from_ints(xs)

    c = ApproxNormCircuit()
    prv, vrf = buckler.compile_circuit(spec, n, c, CRS, seed=b"s2")
    a = ApproxAssign(x.coeffs)
    pf = prv.prove(a)
    assert vrf.verify(a, pf)


def test_decompose_big_vec_huge_base():
    """Base entries >= 2^63 (huge norm bounds) must not overflow the int64
    vectorized path — they yield digit 0 for any balanced int64 value,
    exactly like the per-value big-int loop (round-3 review regression)."""
    import numpy as np

    from ringo_tpu.buckler.utils import decompose_big, decompose_big_vec

    base = [1 << 70, 1 << 63, 1 << 40, 1 << 20, 3, 1]
    xs = np.array([0, 1, -1, (1 << 41) + 5, -(1 << 60)], dtype=np.int64)
    got = decompose_big_vec(xs, base)
    p = 1 << 127  # any modulus large enough to keep values unreduced
    for j, x in enumerate(xs):
        want = decompose_big(int(x) % p, base, p)
        assert list(got[:, j]) == list(want), (x, list(got[:, j]), want)
