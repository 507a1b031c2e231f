"""Interpolation encoder (reference buckler/encoder.go): a witness vector is
the evaluations of its polynomial on the size-rank cyclic subgroup; encoding
is the cyclic INTT zero-padded into the embedding ring, and the randomized
variant adds X^rank blinding that vanishes on the subgroup."""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..ops import ntt as nttmod
from ..rings.bigring import FPoly


class Encoder:
    def __init__(self, spec, rank: int, embed_rank: int):
        self.spec = spec
        self.rank = rank
        self.embed_rank = embed_rank
        self.plan = nttmod.NTTPlan(spec, rank, negacyclic=False)

    def encode(self, v: np.ndarray) -> FPoly:
        """[w, rank] mont value planes -> embed_rank coefficient poly."""
        coeffs = np.zeros((self.spec.w, self.embed_rank), dtype=np.uint32)
        coeffs[:, :self.rank] = nttmod.ntt_inv(self.plan, v[:, :self.rank])
        return FPoly(coeffs, False)

    def rand_encode(self, v: np.ndarray, blind: np.ndarray) -> FPoly:
        """Randomized encode: coeff[rank] = blind, coeff[0] -= blind
        (reference RandEncodeTo, encoder.go:50-54)."""
        p = self.encode(v)
        pd = self.spec.p_digits.reshape(self.spec.w, 1)
        p.coeffs[:, self.rank] = blind
        p.coeffs[:, 0:1] = limb.sub(p.coeffs[:, 0:1], blind[:, None], pd)
        return p
