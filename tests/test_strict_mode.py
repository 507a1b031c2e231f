"""strict=True hardening of the two documented reference quirks:

1. In default (bug-compatible) mode every arithmetic constraint is scaled
   by the SAME batch constant (reference buckler/prover.go:355-379), so two
   individually-violated constraints that cancel algebraically verify; in
   strict mode constraint i gets batchConst^(i+1) and the cancellation is
   caught.
2. Sumcheck target sums are stored but ignored in default mode (reference
   context.go:85-94: only zero-sum witnesses verify); strict mode honors
   the declared totals.
"""

import random

import numpy as np
import pytest

from ringo_tpu import buckler
from ringo_tpu.fields import ZP220

CRS = b"Strict!"
N = 1 << 8


class CancelCircuit:
    """Two arithmetic constraints asserting x = 0 and -x = 0: they cancel
    under same-constant batching whenever x != 0."""

    def __init__(self):
        self.x = buckler.Witness()

    def define(self, ctx):
        a = buckler.ArithmeticConstraint()
        a.add_term(1, None, self.x)
        ctx.add_arithmetic_constraint(a)
        b = buckler.ArithmeticConstraint()
        b.add_term(-1, None, self.x)
        ctx.add_arithmetic_constraint(b)


class CancelAssign:
    def __init__(self, x):
        self.x = x


def _nonzero_x(spec):
    rng = random.Random(5)
    return [rng.randrange(1, 100) for _ in range(N)]


def test_default_mode_misses_cancellation():
    spec = ZP220
    prv, vrf = buckler.compile_circuit(spec, N, CancelCircuit(), CRS,
                                       seed=b"sc")
    pk = CancelAssign(_nonzero_x(spec))
    pf = prv.prove(pk)
    # bug-compatible: the violated constraints cancel and the proof passes
    assert vrf.verify(pk, pf) is True


def test_strict_mode_catches_cancellation():
    spec = ZP220
    prv, vrf = buckler.compile_circuit(spec, N, CancelCircuit(), CRS,
                                       seed=b"sc", strict=True)
    pk = CancelAssign(_nonzero_x(spec))
    pf = prv.prove(pk)
    assert vrf.verify(pk, pf) is False


def test_strict_mode_accepts_satisfied_constraints():
    spec = ZP220
    prv, vrf = buckler.compile_circuit(spec, N, CancelCircuit(), CRS,
                                       seed=b"sc", strict=True)
    pk = CancelAssign([0] * N)
    pf = prv.prove(pk)
    assert vrf.verify(pk, pf) is True


class TargetSumCircuit:
    def __init__(self, total):
        self.total = total
        self.x = buckler.Witness()

    def define(self, ctx):
        c = buckler.ArithmeticConstraint()
        c.add_term(1, None, self.x)
        ctx.add_sum_check_constraint(c, self.total)


def _sum_t_witness(total):
    rng = random.Random(9)
    xs = [rng.randrange(3) for _ in range(N - 1)]
    xs.append((total - sum(xs)) % ZP220.p)
    return xs


def test_strict_mode_honors_target_sum():
    total = 12345
    prv, vrf = buckler.compile_circuit(ZP220, N, TargetSumCircuit(total),
                                       CRS, seed=b"ts", strict=True)
    xs = _sum_t_witness(total)
    pf = prv.prove(CancelAssign(xs))
    assert vrf.verify(CancelAssign(xs), pf) is True
    # wrong target in the verifier's circuit must reject
    prv2, vrf2 = buckler.compile_circuit(ZP220, N, TargetSumCircuit(total + 1),
                                         CRS, seed=b"ts", strict=True)
    assert vrf2.verify(CancelAssign(xs), pf) is False


def test_default_mode_ignores_target_sum():
    """Reference semantics: the sumcheck proves sum == 0 regardless of the
    declared total, so a nonzero-sum witness fails even with the right
    target declared."""
    total = 777
    prv, vrf = buckler.compile_circuit(ZP220, N, TargetSumCircuit(total),
                                       CRS, seed=b"ts2")
    xs = _sum_t_witness(total)
    pf = prv.prove(CancelAssign(xs))
    assert vrf.verify(CancelAssign(xs), pf) is False
