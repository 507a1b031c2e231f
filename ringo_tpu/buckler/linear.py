"""Linear-relation checkers (reference buckler/linear.go): pairs of maps
x -> Mx and x -> M^T x over big-field value vectors (digit planes [w, rank],
Montgomery form)."""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..ops import ntt as nttmod
from ..rings.bigring import CyclotomicRing, FPoly
from .utils import decompose_base


class LinearChecker:
    def transform(self, v: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def transpose(self, v: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class NTTChecker(LinearChecker):
    """Negacyclic NTT map (reference nttChecker, linear.go:20-43):
    transpose = reverse . scale-by-rank . INTT.  Mode-aware via the ring
    (Montgomery stage NTT on numpy, plain BigNTT — jitted — under jax)."""

    def __init__(self, spec, rank: int):
        self.ring = CyclotomicRing(spec, rank)
        self.rank = rank
        self.scale = self.ring.ops.const(rank, (1,))

    def transform(self, v):
        return self.ring.ntt(FPoly(v, False)).coeffs

    def transpose(self, v):
        if limb.get_xp(v) is not np:
            rev = v[:, ::-1]  # device-resident: flip without a host pull
        else:
            rev = np.ascontiguousarray(np.asarray(v)[:, ::-1])
            if self.ring.plain:
                from .. import backend
                if backend.is_jax():
                    rev = backend.to_device(rev)
        scaled = self.ring.mul_planes(rev, self.scale)
        return self.ring.intt(FPoly(scaled, True)).coeffs


class AutChecker(LinearChecker):
    """Galois automorphism checker (reference autChecker, linear.go:46-73)."""

    def __init__(self, ring: CyclotomicRing, idx: int, is_ntt: bool):
        self.ring = ring
        self.is_ntt = is_ntt
        self.idx = idx
        self.idx_inv = pow(idx, -1, 2 * ring.rank)

    def transform(self, v):
        return self.ring.aut(FPoly(v, self.is_ntt), self.idx).coeffs

    def transpose(self, v):
        return self.ring.aut(FPoly(v, self.is_ntt), self.idx_inv).coeffs


class ProjChecker(LinearChecker):
    """128-row random boolean projection (reference projChecker,
    linear.go:94-137); the matrix is filled from a Fiat-Shamir challenge by
    the prover/verifier."""

    ROWS = 128

    def __init__(self, spec, rank: int):
        self.spec = spec
        self.rank = rank
        self.proj = np.zeros((self.ROWS, rank), dtype=bool)

    def fill_from_xof(self, xof):
        """Reference bit order (buckler/prover.go:165-176): per column j read
        32 bytes, bit i of buf[i//8]>>(i%8) == 0 selects row i."""
        raw = np.frombuffer(xof.read(32 * self.rank), dtype=np.uint8)
        raw = raw.reshape(self.rank, 32)
        bits = np.unpackbits(raw, axis=1, bitorder="little")[:, :self.ROWS]
        self.proj = (bits.T == 0)

    def transform(self, v):
        pd = self.spec.p_digits.reshape(self.spec.w, 1, 1)
        masked = np.where(self.proj[None, :, :], v[:, None, :], 0).astype(np.uint32)
        sums = limb.modsum(masked, pd, axis=1)  # [w, ROWS]
        out = np.zeros_like(v)
        out[:, :self.ROWS] = sums
        return out

    def transpose(self, v):
        pd = self.spec.p_digits.reshape(self.spec.w, 1, 1)
        masked = np.where(self.proj.T[None, :, :], v[:, None, :self.ROWS], 0).astype(np.uint32)
        return limb.modsum(masked, pd, axis=1)  # [w, rank]


class ProjRecomposeChecker(LinearChecker):
    """Ternary-base recomposition (reference projRecomposeChecker,
    linear.go:140-180)."""

    def __init__(self, spec, bound: int, plain: bool | None = None):
        from ..fields import FieldOps
        from ..ops.bigmul import BigMul

        self.spec = spec
        if plain is None:
            from .. import backend
            plain = backend.is_jax()
        self.plain = plain
        base = decompose_base(bound)
        self.nb = len(base)
        if plain:
            big = BigMul(spec)
            self.base_planes = limb.ints_to_digits(base, spec.w)
            self._mul = lambda a, b: big.mul_mod(a, b)
        else:
            ops = FieldOps(spec)
            self.base_planes = np.asarray(ops.from_ints(base))  # [w, nb]
            self._mul = lambda a, b: limb.mont_mul(
                a, b, spec.p_digits.reshape(spec.w, 1, 1), spec.qinv16)

    def transform(self, v):
        w, rank = v.shape
        nv = rank // self.nb
        pd = self.spec.p_digits.reshape(w, 1, 1)
        grouped = v[:, :nv * self.nb].reshape(w, nv, self.nb)
        prods = self._mul(grouped, self.base_planes[:, None, :])
        out = np.zeros_like(v)
        out[:, :nv] = limb.modsum(prods, pd, axis=1)
        return out

    def transpose(self, v):
        w, rank = v.shape
        nv = rank // self.nb
        prods = self._mul(v[:, :nv, None], self.base_planes[:, None, :])
        out = np.zeros_like(v)
        out[:, :nv * self.nb] = prods.reshape(w, nv * self.nb)
        return out
