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

    # ---- helpers -----------------------------------------------------------

    def _q_like(self, a):
        return self._bc(a, self.q)

    def _bc(self, a, const_digits):
        """Reshape a [w] constant so it broadcasts against [w, ...] values."""
        nd = np.asarray(a).ndim if isinstance(a, np.ndarray) else a.ndim
        return np.asarray(const_digits).reshape(self.w, *([1] * (nd - 1)))
