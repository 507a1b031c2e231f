"""Arithmetic constraints (reference buckler/constraint.go)."""

from __future__ import annotations

import dataclasses

from .witness import PublicWitness, Witness


@dataclasses.dataclass
class _Term:
    coeff: int                   # constant coefficient (plain int mod p)
    pw_id: int | None            # optional public-witness coefficient poly
    w_ids: list[int]             # product of secret witnesses


class ArithmeticConstraint:
    """Sum of terms coeff * (optional public witness poly) * prod(witnesses)
    (reference constraint.go:6-69)."""

    def __init__(self):
        self.terms: list[_Term] = []

    def add_term(self, coeff: int, coeff_public: PublicWitness | None,
                 *witnesses: Witness):
        pw_id = None if coeff_public is None else coeff_public.id
        self.terms.append(_Term(coeff, pw_id, [w.id for w in witnesses]))

    def sub_term(self, coeff_public: PublicWitness | None, *witnesses: Witness):
        self.add_term(-1, coeff_public, *witnesses)

    def max_rank(self, rank: int) -> int:
        """Degree bound of the constraint polynomial
        (reference constraint.go:56-69)."""
        max_deg = 0
        for t in self.terms:
            deg = (rank - 1) if t.pw_id is not None else 0
            deg += len(t.w_ids) * rank
            max_deg = max(max_deg, deg)
        return max_deg + 1
