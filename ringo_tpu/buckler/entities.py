"""Buckler proof object (reference buckler/entities.go) with a wire format
(the reference keeps proofs in memory; serialization reuses the element
marshal layout, element.go:879-888)."""

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

    def to_bytes(self, params) -> bytes:
        spec = params.spec
        out = [len(self.witness).to_bytes(4, "big")]
        for c in self.witness:
            blob = c.to_bytes()
            out.append(len(blob).to_bytes(8, "big"))
            out.append(blob)
        out.append(spec.marshal(self.lin_check_mask_sum))
        out.append(spec.marshal(self.sum_check_mask_sum))
        out.append(len(self.evals).to_bytes(4, "big"))
        out.extend(spec.marshal(e) for e in self.evals)
        out.append(self.eval_proof.to_bytes(params))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, params, data: bytes) -> "Proof":
        spec = params.spec
        nb = -(-spec.bits // 64) * 8  # marshal width (64-bit-limb layout)
        off = 0
        n_w = int.from_bytes(data[off:off + 4], "big"); off += 4
        witness = []
        for _ in range(n_w):
            ln = int.from_bytes(data[off:off + 8], "big"); off += 8
            witness.append(Commitment.from_bytes(params, data[off:off + ln]))
            off += ln
        lin_sum = spec.unmarshal(data[off:off + nb]); off += nb
        sum_sum = spec.unmarshal(data[off:off + nb]); off += nb
        n_e = int.from_bytes(data[off:off + 4], "big"); off += 4
        evals = []
        for _ in range(n_e):
            evals.append(spec.unmarshal(data[off:off + nb])); off += nb
        eval_proof = JindoProof.from_bytes(params, data[off:])
        return cls(witness, lin_sum, sum_sum, evals, eval_proof)
