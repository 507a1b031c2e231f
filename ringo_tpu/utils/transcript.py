"""Fiat-Shamir primitives.

* ``Shake128Stream`` — incremental-squeeze SHAKE128 oracle (the reference's
  sha3.NewSHAKE128 usage in jindo/prover.go:220-225 and buckler's projection
  expansion).
* ``Transcript`` — named-challenge strong Fiat-Shamir transcript in the style
  of gnark-crypto's fiat-shamir package (buckler/prover.go:113-121):
  challenges are computed in declaration order, each hash binds the previous
  challenge value, the challenge name, and every bound message.
"""

from __future__ import annotations

import hashlib


class Shake128Stream:
    """SHAKE128 with Go x/crypto semantics: absorb with write(), then squeeze
    incrementally with read(); writing after reading is an error; reset()
    restarts."""

    def __init__(self):
        self._data = bytearray()
        self._read_pos = 0
        self._squeezing = False

    def write(self, data: bytes):
        if self._squeezing:
            raise RuntimeError("write after read on SHAKE stream")
        self._data += data

    def read(self, n: int) -> bytes:
        self._squeezing = True
        out = hashlib.shake_128(bytes(self._data)).digest(self._read_pos + n)
        chunk = out[self._read_pos:self._read_pos + n]
        self._read_pos += n
        return chunk

    def reset(self):
        self._data = bytearray()
        self._read_pos = 0
        self._squeezing = False


class Transcript:
    """Ordered named-challenge Fiat-Shamir transcript (SHA-256).

    challenge(id) = H(prev_challenge || id || binding_1 || ... || binding_k).
    Challenges must be computed in declaration order; binding to an
    already-computed challenge is an error.
    """

    def __init__(self, challenge_ids: list[str]):
        self.ids = list(challenge_ids)
        self.bindings: dict[str, list[bytes]] = {i: [] for i in self.ids}
        self.values: dict[str, bytes] = {}

    def bind(self, challenge_id: str, data: bytes):
        if challenge_id in self.values:
            raise ValueError(f"challenge {challenge_id} already computed")
        self.bindings[challenge_id].append(bytes(data))

    def compute_challenge(self, challenge_id: str) -> bytes:
        if challenge_id in self.values:
            return self.values[challenge_id]
        pos = self.ids.index(challenge_id)
        for prev in self.ids[:pos]:
            if prev not in self.values:
                self.compute_challenge(prev)
        h = hashlib.sha256()
        if pos > 0:
            h.update(self.values[self.ids[pos - 1]])
        h.update(challenge_id.encode())
        for b in self.bindings[challenge_id]:
            h.update(b)
        v = h.digest()
        self.values[challenge_id] = v
        return v
