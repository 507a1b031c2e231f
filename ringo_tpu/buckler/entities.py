"""Buckler proof object (reference buckler/entities.go)."""

from __future__ import annotations

import dataclasses

from ..jindo.entities import Commitment
from ..jindo.entities import Proof as JindoProof


@dataclasses.dataclass
class Proof:
    witness: list[Commitment]
    lin_check_mask_sum: int
    sum_check_mask_sum: int
    evals: list[int]
    eval_proof: JindoProof
