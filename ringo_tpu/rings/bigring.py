"""Big-field polynomial rings over Z_p, p = b^k + 1 (reference math/bigpoly).

Polynomials are digit planes [w, rank] in Montgomery form plus an is_ntt
flag.  CyclicRing evaluates over X^rank - 1 (Buckler's interpolation domain),
CyclotomicRing over X^rank + 1 (the witness ring of the proved relations).
All vector ops run through the generic limb kernels; the NTTs are the
stage-vectorized engine (ops/ntt.py) — the reference's 8-wide manual unrolls
(bigpoly/vec.go, ntt.go:277-466) are replaced by whole-array ops.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields import FieldOps, FieldSpec, limb
from ..ops import ntt as nttmod


@dataclasses.dataclass
class FPoly:
    """Big-field polynomial: digit planes [w, rank], Montgomery form."""
    coeffs: np.ndarray
    is_ntt: bool = False

    @property
    def rank(self) -> int:
        return self.coeffs.shape[-1]

    def copy(self) -> "FPoly":
        return FPoly(self.coeffs.copy(), self.is_ntt)


class BigRing:
    """Shared evaluator (reference bigpoly baseOperator, base_op.go:10-207)."""

    negacyclic = False

    def __init__(self, spec: FieldSpec, rank: int):
        self.spec = spec
        self.rank = rank
        self.ops = FieldOps(spec)
        self.plan = nttmod.NTTPlan(spec, rank, self.negacyclic)

    # -- construction --------------------------------------------------------

    def new_poly(self, is_ntt: bool = False) -> FPoly:
        return FPoly(np.zeros((self.spec.w, self.rank), dtype=np.uint32), is_ntt)

    def from_ints(self, values, is_ntt: bool = False) -> FPoly:
        vals = list(values) + [0] * (self.rank - len(values))
        return FPoly(self.ops.from_ints(vals), is_ntt)

    def to_ints(self, p: FPoly) -> list[int]:
        return self.ops.to_ints(p.coeffs)

    # -- arithmetic -----------------------------------------------------------

    def add(self, a: FPoly, b: FPoly) -> FPoly:
        assert a.is_ntt == b.is_ntt
        return FPoly(self.ops.add(a.coeffs, b.coeffs), a.is_ntt)

    def sub(self, a: FPoly, b: FPoly) -> FPoly:
        assert a.is_ntt == b.is_ntt
        return FPoly(self.ops.sub(a.coeffs, b.coeffs), a.is_ntt)

    def neg(self, a: FPoly) -> FPoly:
        return FPoly(self.ops.neg(a.coeffs), a.is_ntt)

    def scalar_mul(self, a: FPoly, c: int) -> FPoly:
        cd = self.ops.const(c, (1,))
        return FPoly(self.ops.mul(a.coeffs, cd), a.is_ntt)

    def mul(self, a: FPoly, b: FPoly) -> FPoly:
        if not (a.is_ntt and b.is_ntt):
            raise ValueError("mul requires NTT domain")
        return FPoly(self.ops.mul(a.coeffs, b.coeffs), True)

    def ntt(self, a: FPoly) -> FPoly:
        if a.is_ntt:
            raise ValueError("already NTT")
        return FPoly(nttmod.ntt_fwd(self.plan, a.coeffs), True)

    def intt(self, a: FPoly) -> FPoly:
        if not a.is_ntt:
            raise ValueError("not NTT")
        return FPoly(nttmod.ntt_inv(self.plan, a.coeffs), False)

    def evaluate(self, a: FPoly, x: int) -> int:
        """Horner evaluation at x over Z_p (host)."""
        if a.is_ntt:
            raise ValueError("evaluate requires coefficient domain")
        coeffs = self.to_ints(a)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % self.spec.p
        return acc


class CyclicRing(BigRing):
    """Z_p[X]/(X^rank - 1) (reference CyclicEvaluator, bigpoly/cyclic.go)."""

    negacyclic = False

    def quo_rem_by_vanishing(self, p: FPoly, n: int) -> tuple[FPoly, FPoly]:
        """Divide by X^n - 1 via suffix-summed coefficient blocks
        (reference cyclic.go:18-37, vectorized: quo block j-1 is the suffix
        sum of blocks >= j, rem is the total block sum)."""
        if p.is_ntt:
            raise ValueError("input in NTT domain")
        if self.rank % n:
            raise ValueError("n must divide rank")
        nb = self.rank // n
        blocks = p.coeffs.reshape(self.spec.w, nb, n)
        pd = self.spec.p_digits.reshape(self.spec.w, 1)
        suffix = blocks[:, nb - 1, :]
        quo = np.zeros((self.spec.w, self.rank), dtype=np.uint32)
        for j in range(nb - 1, 0, -1):
            quo[:, (j - 1) * n:j * n] = suffix
            suffix = limb.add(blocks[:, j - 1, :], suffix, pd)
        rem = np.zeros((self.spec.w, self.rank), dtype=np.uint32)
        rem[:, :n] = suffix
        return FPoly(quo, False), FPoly(rem, False)


class CyclotomicRing(BigRing):
    """Z_p[X]/(X^rank + 1) (reference CyclotomicEvaluator,
    bigpoly/cyclotomic.go)."""

    negacyclic = True

    def aut(self, p: FPoly, idx: int) -> FPoly:
        """Galois automorphism X -> X^idx (reference AutTo,
        cyclotomic.go:29-82) in either domain."""
        if idx % 2 == 0:
            raise ValueError("idx must be odd")
        idx %= 2 * self.rank
        if p.is_ntt:
            perm = nttmod.aut_ntt_permutation(self.rank, idx)
            return FPoly(np.ascontiguousarray(p.coeffs[:, perm]), True)
        dst, sign = nttmod.aut_coeff_maps(self.rank, idx)
        src = np.argsort(dst)
        pd = self.spec.p_digits.reshape(self.spec.w, 1)
        moved = p.coeffs[:, src]
        neg = limb.neg(moved, pd)
        out = np.where(sign[src][None, :] < 0, neg, moved)
        return FPoly(out.astype(np.uint32), False)

    def mod_switch_ints(self, values: list[int], q_from: int) -> FPoly:
        """Round values mod q_from to the nearest multiple representation mod
        p (reference ModSwitchTo, cyclotomic.go:99-124)."""
        p = self.spec.p
        out = []
        q_half = q_from >> 1
        for v in values:
            c = v * p
            c_rem = c % q_from
            if c_rem > q_half:
                c_rem -= q_from
            c = (c - c_rem) // q_from
            out.append(c % p)
        return self.from_ints(out)
