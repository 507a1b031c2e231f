"""Interpolation encoder (reference buckler/encoder.go): a witness vector is
the evaluations of its polynomial on the size-rank cyclic subgroup; encoding
is the cyclic INTT zero-padded into the embedding ring, and the randomized
variant adds X^rank blinding that vanishes on the subgroup.

Mode-aware like rings/bigring: Montgomery + host stage NTT under numpy,
plain + device BigNTT under jax (the encode is one jitted program)."""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..ops import ntt as nttmod
from ..ops.bigntt_matmul import make_device_plan
from ..rings.bigring import FPoly


class Encoder:
    def __init__(self, spec, rank: int, embed_rank: int,
                 plain: bool | None = None):
        self.spec = spec
        self.rank = rank
        self.embed_rank = embed_rank
        if plain is None:
            from .. import backend
            plain = backend.is_jax()
        self.plain = plain
        if plain:
            self.dev_plan = make_device_plan(spec, rank, negacyclic=False)
            self.plan = None
        else:
            self.plan = nttmod.NTTPlan(spec, rank, negacyclic=False)
            self.dev_plan = None
        self._jits = {}

    def _jit(self, name, fn):
        if name not in self._jits:
            from .. import backend

            owners = [] if self.dev_plan is None \
                or not hasattr(self.dev_plan, "devconst_owners") \
                else self.dev_plan.devconst_owners()
            if backend.is_jax() and owners:
                # cyclic-plan tables as jit arguments (ops/devconst.py);
                # snapshot deferred to call time (never under a trace)
                from ..ops import devconst

                def tabs():
                    if getattr(self, "_dev_tabs", None) is None:
                        self._dev_tabs = devconst.device_tables(
                            owners, backend.to_device)
                    return self._dev_tabs

                self._jits[name] = devconst.wrap(fn, owners, backend.jit,
                                                 tabs)
            else:
                self._jits[name] = backend.jit(fn)
        return self._jits[name]

    def encode(self, v: np.ndarray) -> FPoly:
        """[w, rank] value planes -> embed_rank coefficient poly."""
        if self.plain:
            def run(vv):
                xp = limb.get_xp(vv)
                coeffs = self.dev_plan.inv(vv[:, :self.rank])
                pad = xp.zeros((self.spec.w, self.embed_rank - self.rank),
                               dtype=xp.uint32)
                return xp.concatenate([coeffs, pad], axis=1)
            from .. import backend
            fn = self._jit("encode", run) if backend.is_jax() else run
            return FPoly(fn(np.asarray(v) if isinstance(v, np.ndarray) else v),
                         False)
        coeffs = np.zeros((self.spec.w, self.embed_rank), dtype=np.uint32)
        coeffs[:, :self.rank] = nttmod.ntt_inv(self.plan, v[:, :self.rank])
        return FPoly(coeffs, False)

    def rand_encode(self, v: np.ndarray, blind: np.ndarray) -> FPoly:
        """Randomized encode: coeff[rank] = blind, coeff[0] -= blind
        (reference RandEncodeTo, encoder.go:50-54)."""
        pd = self.spec.p_digits.reshape(self.spec.w, 1)
        if self.plain:
            def run(vv, bl):
                xp = limb.get_xp(vv, bl)
                coeffs = self.dev_plan.inv(vv[:, :self.rank])
                c0 = limb.sub(coeffs[:, 0:1], bl[:, None], pd)
                mid = coeffs[:, 1:self.rank]
                pad = xp.zeros(
                    (self.spec.w, self.embed_rank - self.rank - 1),
                    dtype=xp.uint32)
                return xp.concatenate([c0, mid, bl[:, None], pad], axis=1)
            from .. import backend
            fn = self._jit("rand_encode", run) if backend.is_jax() else run
            return FPoly(fn(v, blind), False)
        p = self.encode(v)
        p.coeffs[:, self.rank] = blind
        p.coeffs[:, 0:1] = limb.sub(p.coeffs[:, 0:1], blind[:, None], pd)
        return p
