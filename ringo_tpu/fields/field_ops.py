"""FieldOps: binds a FieldSpec to the generic limb kernels.

Device arrays produced by this class are always in **Montgomery form**
(matching the reference's goff elements, jindo/internal/zp/element.go:36-46);
host-side Python ints are always plain.  Conversions happen only at the
host/device boundary.
"""

from __future__ import annotations

import numpy as np

from . import limb
from .spec import FieldSpec


class FieldOps:
    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.w = spec.w
        self.q = spec.p_digits                 # [w] u32
        self.r2 = spec.r2_digits               # [w] u32
        self.one = spec.one_digits             # [w] u32
        self.qinv16 = spec.qinv16              # python int

    # ---- host <-> device --------------------------------------------------

    def from_ints(self, values) -> np.ndarray:
        """Plain Python ints -> Montgomery digit planes [w, N]."""
        d = limb.ints_to_digits([int(v) % self.spec.p for v in values], self.w)
        return self.to_mont(d)

    def to_ints(self, digits) -> list[int]:
        """Montgomery digit planes -> plain Python ints."""
        return limb.digits_to_ints(np.asarray(self.from_mont(digits)))

    def from_int(self, v: int) -> np.ndarray:
        return self.from_ints([v])[:, 0]

    def to_int(self, digits) -> int:
        return self.to_ints(np.asarray(digits).reshape(self.w, 1))[0]

    # ---- elementwise ops (Montgomery domain) -------------------------------

    def add(self, a, b):
        return limb.add(a, b, self._q_like(a))

    def sub(self, a, b):
        return limb.sub(a, b, self._q_like(a))

    def neg(self, a):
        return limb.neg(a, self._q_like(a))

    def mul(self, a, b):
        return limb.mont_mul(a, b, self._q_like(a), self.qinv16)

    def to_mont(self, a):
        return limb.mont_mul(a, self._bc(a, self.r2), self._q_like(a), self.qinv16)

    def from_mont(self, a):
        return limb.mont_mul(a, self._bc(a, self.one), self._q_like(a), self.qinv16)

    def is_zero(self, a):
        return limb.is_zero(a)

    def zeros(self, shape, xp=np):
        return xp.zeros((self.w, *shape), dtype=xp.uint32)

    def const(self, v: int, shape, xp=np):
        """Montgomery-form constant broadcast to [w, *shape]."""
        digits = self.spec.to_digits_int((int(v) % self.spec.p) * self.spec.R % self.spec.p)
        out = xp.zeros((self.w, *shape), dtype=xp.uint32)
        arr = xp.asarray(np.array(digits, dtype=np.uint32).reshape(self.w, *([1] * len(shape))))
        return out + arr

    def double(self, a):
        return self.add(a, a)

    def halve(self, a):
        """a/2 mod p: add p to odd values, then shift right one bit
        (reference element Halve)."""
        xp = limb.get_xp(a)
        odd = (a[0] & xp.uint32(1)) != 0
        qb = self._q_like(a)
        bumped, carry = limb._add_carry(xp, limb._unstack(a),
                                        limb._unstack(a * 0 + qb))
        use = [xp.where(odd, b, orig) for b, orig in zip(bumped, limb._unstack(a))]
        top = xp.where(odd, carry, xp.uint32(0))
        out = []
        for j in range(self.w):
            hi = use[j + 1] if j + 1 < self.w else top
            out.append(((use[j] >> xp.uint32(1))
                        | ((hi & xp.uint32(1)) << xp.uint32(15))) & xp.uint32(0xFFFF))
        return xp.stack(out, axis=0)

    def select(self, cond, a, b):
        """cond ? a : b elementwise (reference element Select)."""
        xp = limb.get_xp(a, b)
        return xp.where(cond, a, b)

    def eq(self, a, b):
        return limb.eq(a, b)

    def cmp(self, a, b):
        """3-way compare of the *Montgomery representations* (the reference
        element Cmp compares regular form; use on from_mont planes for
        value order — this mirrors Vector sort semantics on raw limbs)."""
        return limb.cmp(a, b)

    def bit_len(self, a):
        """BitLen of the canonical value: converts out of Montgomery form
        first (reference element BitLen operates on the regular form)."""
        return limb.bit_len(self.from_mont(a))

    def mul_by_3(self, a):
        """a*3 via additions (reference asm MulBy3 fast path)."""
        return self.add(self.double(a), a)

    def mul_by_5(self, a):
        return self.add(self.double(self.double(a)), a)

    def mul_by_13(self, a):
        d2 = self.double(a)
        d4 = self.double(d2)
        d8 = self.double(d4)
        return self.add(self.add(d8, d4), a)

    # ---- exponentiation / inversion (host, square-and-multiply) -----------

    def exp(self, a, e: int):
        """a^e by square-and-multiply (reference bignum.Exp / element Exp).
        Host-side loop over the bits of the Python int exponent."""
        if e < 0:
            raise ValueError("negative exponent")
        acc = self.const(1, np.asarray(a).shape[1:])
        base = a
        while e:
            if e & 1:
                acc = self.mul(acc, base)
            e >>= 1
            if e:
                base = self.mul(base, base)
        return acc

    def inverse(self, a):
        """a^(p-2) (Fermat; reference element Inverse is an EEA — same
        result, zero maps to zero)."""
        return self.exp(a, self.spec.p - 2)

    def legendre(self, a):
        """Legendre symbol as field values: 1, p-1, or 0 (Montgomery planes;
        reference element Legendre)."""
        return self.exp(a, (self.spec.p - 1) >> 1)

    def sqrt(self, a):
        """Square roots via Tonelli-Shanks (reference element Sqrt).
        Returns (root, ok_mask); root is arbitrary-signed where ok."""
        p = self.spec.p
        xp = limb.get_xp(a)
        # p = b^k + 1 with 2^31 | b^k, so the 2-adic valuation is large:
        # factor p - 1 = q * 2^s
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        # find a quadratic non-residue (host, deterministic)
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        c = self.const(pow(z, q, p), np.asarray(a).shape[1:])
        t = self.exp(a, q)
        r = self.exp(a, (q + 1) >> 1)
        one = self.const(1, np.asarray(a).shape[1:])
        for i in range(s - 1, 0, -1):
            t_chk = self.exp(t, 1 << (i - 1))
            flip = ~limb.eq(t_chk, one) & ~limb.is_zero(t)
            r = self.select(flip, self.mul(r, c), r)
            c = self.mul(c, c)
            t = self.select(flip, self.mul(t, c), t)
        ok = limb.eq(self.mul(r, r), a) | limb.is_zero(a)
        return r, ok

    def batch_invert(self, a):
        """Montgomery-trick batch inversion over the last axis (reference
        element.go BatchInvert): one inversion + 3(n-1) muls; zeros stay
        zero."""
        xp = limb.get_xp(a)
        n = a.shape[-1]
        zero_mask = limb.is_zero(a)
        safe = self.select(zero_mask, self._one_like(a), a)
        prefix = [safe[..., 0]]
        for i in range(1, n):
            prefix.append(self.mul(prefix[-1], safe[..., i]))
        inv = self.inverse(prefix[-1])
        out = [None] * n
        for i in range(n - 1, 0, -1):
            out[i] = self.mul(inv, prefix[i - 1])
            inv = self.mul(inv, safe[..., i])
        out[0] = inv
        res = xp.stack(out, axis=-1)
        return self.select(zero_mask, res * 0, res)

    def _one_like(self, a):
        return self._bc(a, self.one) + (a * 0)

    # ---- serialization (reference Vector.WriteTo/ReadFrom,
    # vector.go:53-244: length-prefixed big-endian elements) ---------------

    def marshal_vector(self, digits) -> bytes:
        """Montgomery planes [w, n] -> length-prefixed big-endian bytes."""
        vals = self.to_ints(digits)
        nb = (self.spec.bits + 7) // 8
        out = len(vals).to_bytes(8, "big")
        return out + b"".join(v.to_bytes(nb, "big") for v in vals)

    def unmarshal_vector(self, data: bytes) -> np.ndarray:
        n = int.from_bytes(data[:8], "big")
        nb = (self.spec.bits + 7) // 8
        vals = [int.from_bytes(data[8 + i * nb:8 + (i + 1) * nb], "big")
                for i in range(n)]
        return self.from_ints(vals)

    # ---- helpers -----------------------------------------------------------

    def _q_like(self, a):
        return self._bc(a, self.q)

    def _bc(self, a, const_digits):
        """Reshape a [w] constant so it broadcasts against [w, ...] values."""
        nd = np.asarray(a).ndim if isinstance(a, np.ndarray) else a.ndim
        return np.asarray(const_digits).reshape(self.w, *([1] * (nd - 1)))
