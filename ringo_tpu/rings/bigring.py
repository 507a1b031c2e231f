"""Big-field polynomial rings over Z_p, p = b^k + 1 (reference math/bigpoly).

Polynomials are digit planes [w, rank] plus an is_ntt flag.  CyclicRing
evaluates over X^rank - 1 (Buckler's interpolation domain), CyclotomicRing
over X^rank + 1 (the witness ring of the proved relations).

Two representation modes, chosen at construction (default: by backend):

* **Montgomery** (host/numpy): values are Montgomery digit planes, multiplied
  with the CIOS kernel (fields/limb) — the reference's representation
  (jindo/internal/zp element.go).
* **plain** (jax/TPU): values are plain digit planes, multiplied through
  ops/bigmul (scan-structured convolution + Barrett) and transformed by
  ops/bigntt — the O(w)-graph forms that compile for up to 880-bit fields.
  Ops dispatch on the input array type, so the same ring serves host numpy
  values and jitted device chains.

``ring.ops`` exposes the representation-appropriate vector operations with
one interface (from_ints/to_ints/mul/const/from_mont), so the PIOP layer is
representation-blind.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fields import FieldOps, FieldSpec, limb
from ..ops import ntt as nttmod
from ..ops.bigmul import BigMul
from ..ops.bigntt import BigNTTDev


@dataclasses.dataclass
class FPoly:
    """Big-field polynomial: digit planes [w, rank] (representation per the
    owning ring's mode)."""
    coeffs: np.ndarray
    is_ntt: bool = False

    @property
    def rank(self) -> int:
        return self.coeffs.shape[-1]

    def copy(self) -> "FPoly":
        return FPoly(self.coeffs.copy(), self.is_ntt)


class PlainOps:
    """FieldOps-compatible vector ops in plain representation."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.w = spec.w
        self.big = BigMul(spec)
        self._mul_jit = None

    def from_ints(self, values) -> np.ndarray:
        return limb.ints_to_digits([int(v) % self.spec.p for v in values],
                                   self.w)

    def to_ints(self, digits) -> list[int]:
        return limb.digits_to_ints(np.asarray(digits))

    def mul(self, a, b):
        if limb.get_xp(a, b) is not np:
            if self._mul_jit is None:
                from .. import backend
                self._mul_jit = backend.jit(self.big.mul_mod)
            return self._mul_jit(a, b)
        return self.big.mul_mod(a, b)

    def const(self, v: int, shape, xp=np):
        digits = self.spec.to_digits_int(int(v) % self.spec.p)
        out = xp.zeros((self.w, *shape), dtype=xp.uint32)
        arr = xp.asarray(np.array(digits, dtype=np.uint32).reshape(
            self.w, *([1] * len(shape))))
        return out + arr

    def from_mont(self, a):
        """Identity — plain mode has no Montgomery factor.  Kept so the PIOP
        layer's "strip to plain value planes" step is representation-blind."""
        return a

    def add(self, a, b):
        return limb.add(a, b, self._q(a))

    def sub(self, a, b):
        return limb.sub(a, b, self._q(a))

    def neg(self, a):
        return limb.neg(a, self._q(a))

    def _q(self, a):
        return np.asarray(self.spec.p_digits).reshape(
            (self.w,) + (1,) * (a.ndim - 1))


class BigRing:
    """Shared evaluator (reference bigpoly baseOperator, base_op.go:10-207)."""

    negacyclic = False

    def __init__(self, spec: FieldSpec, rank: int, plain: bool | None = None):
        self.spec = spec
        self.rank = rank
        if plain is None:
            from .. import backend
            plain = backend.is_jax()
        self.plain = plain
        if plain:
            from ..ops.bigntt_matmul import make_device_plan
            self.ops = PlainOps(spec)
            self.dev_plan = make_device_plan(spec, rank, self.negacyclic)
            self.plan = None
        else:
            self.ops = FieldOps(spec)
            self.plan = nttmod.NTTPlan(spec, rank, self.negacyclic)
            self.dev_plan = None
        self._jits = {}

    # -- jit plumbing (plain mode; device arrays route through these) -------

    def _jit(self, name, fn):
        if name not in self._jits:
            from .. import backend

            owners = self.devconst_owners() if backend.is_jax() else []
            if owners:
                # pass the NTT plan's big tables (twiddles / DFT maps) as
                # jit arguments, not inline constants (ops/devconst.py).
                # The table snapshot is deferred to call time: wrap's call
                # only reaches it with a clean trace state, so no tracers
                # can be captured (a _jit built inside another stage's
                # trace runs the raw fn inline instead).
                from ..ops import devconst

                self._jits[name] = devconst.wrap(
                    fn, owners, backend.jit, self._dev_tabs)
            else:
                self._jits[name] = backend.jit(fn)
        return self._jits[name]

    def _dev_tabs(self):
        if getattr(self, "_dev_tabs_cache", None) is None:
            from .. import backend
            from ..ops import devconst

            self._dev_tabs_cache = devconst.device_tables(
                self.devconst_owners(), backend.to_device)
        return self._dev_tabs_cache

    def devconst_owners(self):
        plan = self.dev_plan
        if plan is None or not hasattr(plan, "devconst_owners"):
            return []
        return plan.devconst_owners()

    def _is_dev(self, *arrays) -> bool:
        return any(limb.get_xp(a) is not np for a in arrays)

    def to_device(self, p: FPoly) -> FPoly:
        from .. import backend
        return FPoly(backend.to_device(p.coeffs), p.is_ntt)

    # -- construction --------------------------------------------------------

    def new_poly(self, is_ntt: bool = False) -> FPoly:
        return FPoly(np.zeros((self.spec.w, self.rank), dtype=np.uint32), is_ntt)

    def from_ints(self, values, is_ntt: bool = False) -> FPoly:
        vals = list(values) + [0] * (self.rank - len(values))
        return FPoly(np.asarray(self.ops.from_ints(vals)), is_ntt)

    def to_ints(self, p: FPoly) -> list[int]:
        return self.ops.to_ints(np.asarray(p.coeffs))

    # -- arithmetic -----------------------------------------------------------

    def _q(self, a):
        return np.asarray(self.spec.p_digits).reshape(
            (self.spec.w,) + (1,) * (a.ndim - 1))

    def add(self, a: FPoly, b: FPoly) -> FPoly:
        assert a.is_ntt == b.is_ntt
        if self.plain and self._is_dev(a.coeffs, b.coeffs):
            f = self._jit("add", lambda x, y: limb.add(x, y, self._q(x)))
            return FPoly(f(a.coeffs, b.coeffs), a.is_ntt)
        return FPoly(limb.add(a.coeffs, b.coeffs, self._q(a.coeffs)), a.is_ntt)

    def sub(self, a: FPoly, b: FPoly) -> FPoly:
        assert a.is_ntt == b.is_ntt
        if self.plain and self._is_dev(a.coeffs, b.coeffs):
            f = self._jit("sub", lambda x, y: limb.sub(x, y, self._q(x)))
            return FPoly(f(a.coeffs, b.coeffs), a.is_ntt)
        return FPoly(limb.sub(a.coeffs, b.coeffs, self._q(a.coeffs)), a.is_ntt)

    def neg(self, a: FPoly) -> FPoly:
        return FPoly(limb.neg(a.coeffs, self._q(a.coeffs)), a.is_ntt)

    def scalar_mul(self, a: FPoly, c: int) -> FPoly:
        cd = self.ops.const(c, (1,))
        return FPoly(self.mul_planes(a.coeffs, cd), a.is_ntt)

    def mul(self, a: FPoly, b: FPoly) -> FPoly:
        if not (a.is_ntt and b.is_ntt):
            raise ValueError("mul requires NTT domain")
        return FPoly(self.mul_planes(a.coeffs, b.coeffs), True)

    def mul_planes(self, a, b):
        """Pointwise product of value planes in the ring's representation."""
        if self.plain:
            if self._is_dev(a, b):
                return self._jit("mulp", self.ops.mul)(a, b)
            return self.ops.mul(a, b)
        return self.ops.mul(a, b)

    def shard(self, mesh, n1: int | None = None):
        """Swap the device NTT plans for the coefficient-sharded four-step
        engine (parallel.ShardedBigNTT): ntt/intt become one all-to-all
        program over the mesh's ``sp`` axis.  Only the transform *pair*
        changes (natural DFT order both ways, mutually inverse), so every
        ntt -> pointwise mul -> intt chain produces bit-identical
        coefficients to the single-device plans; the semantics-bearing
        interpolation encode (buckler/encoder.py) is untouched.  Plain
        (jax) mode, cyclic rings only."""
        if not self.plain:
            raise ValueError("shard() requires the plain (jax) ring mode")
        if self.negacyclic:
            raise ValueError("four-step sharding is cyclic-only")
        from ..parallel.bigntt import ShardedBigNTT
        sh = ShardedBigNTT(self.spec, self.rank, mesh, n1=n1)
        self._sharded_ntt = sh
        self._jits["ntt"] = sh.fwd_fn()
        self._jits["intt"] = sh.inv_fn()
        return sh

    def ntt(self, a: FPoly) -> FPoly:
        if a.is_ntt:
            raise ValueError("already NTT")
        if self.plain:
            if getattr(self, "_sharded_ntt", None) is not None:
                return FPoly(self._jits["ntt"](a.coeffs), True)
            f = self._jit("ntt", self.dev_plan.fwd) \
                if self._is_dev(a.coeffs) else self.dev_plan.fwd
            return FPoly(f(a.coeffs), True)
        return FPoly(nttmod.ntt_fwd(self.plan, a.coeffs), True)

    def intt(self, a: FPoly) -> FPoly:
        if not a.is_ntt:
            raise ValueError("not NTT")
        if self.plain:
            if getattr(self, "_sharded_ntt", None) is not None:
                return FPoly(self._jits["intt"](a.coeffs), False)
            f = self._jit("intt", self.dev_plan.inv) \
                if self._is_dev(a.coeffs) else self.dev_plan.inv
            return FPoly(f(a.coeffs), False)
        return FPoly(nttmod.ntt_inv(self.plan, a.coeffs), False)

    def evaluate(self, a: FPoly, x: int) -> int:
        """Polynomial evaluation at x over Z_p — on device when the jax
        backend is live (ops/horner), host big-int Horner otherwise.
        Reference bigpoly/poly.go:60-70."""
        if a.is_ntt:
            raise ValueError("evaluate requires coefficient domain")
        from .. import backend
        if self.plain and backend.is_jax():
            if not hasattr(self, "_horner"):
                from ..ops.horner import HornerPlan
                self._horner = HornerPlan(self.spec)
            return self._horner.evaluate_many([a.coeffs], x)[0]
        coeffs = self.to_ints(a)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % self.spec.p
        return acc

    def evaluate_many(self, polys, x: int) -> list[int]:
        """Batched evaluation of several polys at the same point — one
        device program for the whole batch."""
        from .. import backend
        if self.plain and backend.is_jax():
            if not hasattr(self, "_horner"):
                from ..ops.horner import HornerPlan
                self._horner = HornerPlan(self.spec)
            return self._horner.evaluate_many([p.coeffs for p in polys], x)
        return [self.evaluate(p, x) for p in polys]


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

        def run(coeffs):
            xp = limb.get_xp(coeffs)
            nb = self.rank // n
            blocks = coeffs.reshape(self.spec.w, nb, n)
            pd = self._q(blocks[:, 0, :])
            suffix = blocks[:, nb - 1, :]
            quo_blocks = [None] * nb
            quo_blocks[nb - 1] = xp.zeros_like(suffix)
            for j in range(nb - 1, 0, -1):
                quo_blocks[j - 1] = suffix
                suffix = limb.add(blocks[:, j - 1, :], suffix, pd)
            quo = xp.stack(quo_blocks, axis=1).reshape(self.spec.w, self.rank)
            rem = xp.concatenate(
                [suffix, xp.zeros((self.spec.w, self.rank - n),
                                  dtype=xp.uint32)], axis=1)
            return quo, rem

        if self.plain and self._is_dev(p.coeffs):
            quo, rem = self._jit(("quo", n), run)(p.coeffs)
        else:
            quo, rem = run(p.coeffs)
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
        xp = limb.get_xp(p.coeffs)
        if p.is_ntt:
            perm = nttmod.aut_ntt_permutation(self.rank, idx)
            return FPoly(xp.ascontiguousarray(p.coeffs[:, perm])
                         if xp is np else p.coeffs[:, perm], True)
        dst, sign = nttmod.aut_coeff_maps(self.rank, idx)
        src = np.argsort(dst)
        pd = self._q(p.coeffs)
        moved = p.coeffs[:, src]
        neg = limb.neg(moved, pd)
        out = xp.where(np.asarray(sign[src])[None, :] < 0, neg, moved)
        return FPoly(out.astype(xp.uint32), False)

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
