"""Device big-field NTT in plain representation (Barrett muls via BigMul).

The host path (ops/ntt.py + fields/limb CIOS) works in Montgomery form with
an O(w^2)-unrolled multiply — right for numpy, impossible to compile for
w = 55 digit fields.  This engine keeps values plain and multiplies through
ops/bigmul (scan-structured convolutions + Barrett), so one butterfly stage
is an O(w) graph and a full 2^16-point 880-bit NTT compiles.

Twiddle tables are the same host-generated roots as ops/ntt.py (plain, not
Montgomery), so results agree exactly with the host engine after Montgomery
stripping.  Used by rings/bigring's device path for the Buckler prover.
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec
from . import ntt as nttmod
from .bigmul import BigMul


class BigNTTDev:
    def __init__(self, spec: FieldSpec, n: int, negacyclic: bool):
        self.spec = spec
        self.n = n
        self.negacyclic = negacyclic
        self.mul = BigMul(spec)
        from . import devconst

        tw, twinv, ninv = nttmod._tables_host(spec.p, spec.b, spec.k, n,
                                              negacyclic)
        # registered: jitted callers pass the [w, n] twiddle planes as
        # arguments instead of inline HLO constants (ops/devconst.py)
        self.tw = devconst.register(self, "tw",
                                    limb.ints_to_digits(tw, spec.w))
        self.twinv = devconst.register(self, "twinv",
                                       limb.ints_to_digits(twinv, spec.w))
        self.ninv = limb.ints_to_digits([ninv], spec.w)[:, 0]
        self.pd = spec.p_digits

    def devconst_owners(self):
        return [self]

    def _q(self, a):
        return np.asarray(self.pd).reshape(
            (self.spec.w,) + (1,) * (a.ndim - 1))

    def _tw_slice(self, tbl, m, vndim):
        """Twiddles for stage m as [w, ..., m, 1] broadcast planes."""
        t = tbl[:, m:2 * m]
        return t.reshape((self.spec.w,) + (1,) * (vndim - 3) + (m, 1))

    def fwd(self, x):
        """Forward NTT over the last axis; x plain planes [w, *batch, n]."""
        xp = limb.get_xp(x)
        n = self.n
        shape = x.shape
        m = 1
        while m <= n // 2:
            t = n // (2 * m)
            x = x.reshape(*shape[:-1], m, 2, t)
            u = x[..., 0, :]
            v = x[..., 1, :]
            from . import devconst
            twm = self._tw_slice(devconst.get(self, "tw"), m, u.ndim)
            vw = self.mul.mul_mod(v, xp.asarray(twm) + xp.zeros_like(v))
            q = self._q(u)
            x = xp.stack([limb.add(u, vw, q), limb.sub(u, vw, q)], axis=-2)
            x = x.reshape(shape)
            m <<= 1
        return x

    def inv(self, x):
        """Inverse NTT (includes the 1/n scaling)."""
        xp = limb.get_xp(x)
        n = self.n
        shape = x.shape
        m = n // 2
        while m >= 1:
            t = n // (2 * m)
            x = x.reshape(*shape[:-1], m, 2, t)
            u = x[..., 0, :]
            v = x[..., 1, :]
            q = self._q(u)
            s = limb.add(u, v, q)
            d = limb.sub(u, v, q)
            from . import devconst
            twm = self._tw_slice(devconst.get(self, "twinv"), m, u.ndim)
            d = self.mul.mul_mod(d, xp.asarray(twm) + xp.zeros_like(d))
            x = xp.stack([s, d], axis=-2)
            x = x.reshape(shape)
            m >>= 1
        ninv = np.asarray(self.ninv).reshape(
            (self.spec.w,) + (1,) * (x.ndim - 1))
        return self.mul.mul_mod(x, xp.asarray(ninv) + xp.zeros_like(x))
