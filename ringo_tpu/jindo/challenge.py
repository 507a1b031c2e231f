"""Challenge encodings and evaluation vectors (reference jindo/utils.go)."""

from __future__ import annotations

import numpy as np

from .params import Parameters


def encode_challenges(params: Parameters, ring, chal_list) -> np.ndarray:
    """Batch of 128-bit challenges -> sparse signed ring polynomials,
    MForm+NTT, as ONE [2, L, n, d] tensor (reference encodeChallengeTo,
    jindo/utils.go:21-46, which encodes one at a time: a per-challenge
    host NTT cost ~2 ms; the cols=64 challenge set of an N=2^19
    evaluate/verify took 147 ms serially vs ~8 ms batched)."""
    p = params
    bound = p.challenge_bound
    coeffs = np.zeros((len(chal_list), p.degree), dtype=np.int64)
    for j, chal_bytes in enumerate(chal_list):
        c = ((int.from_bytes(chal_bytes[8:16], "big") << 64)
             | int.from_bytes(chal_bytes[:8], "big"))
        for i in range(p.exp):
            c, r = divmod(c, bound)
            coeffs[j, i * p.slots] = r - bound if r > bound // 2 else r
    poly = ring.embed_int64(coeffs)
    return ring.ntt(ring.mform(poly))


def encode_challenge(params: Parameters, ring, chal_bytes: bytes) -> np.ndarray:
    """Single-challenge form of ``encode_challenges``: [2, L, 1, d]."""
    return encode_challenges(params, ring, [chal_bytes])


def left_vec(params: Parameters, x: int) -> list[int]:
    """Row multipliers 1, s, s^2, ..., with the last row replaced by x,
    s = x^(cols*slots) (reference leftVec, jindo/utils.go:62-72)."""
    p = params.spec.p
    skip = pow(x, params.cols * params.slots, p)
    left = [1] * params.rows
    for i in range(1, params.rows):
        left[i] = left[i - 1] * skip % p
    left[params.rows - 1] = x % p
    return left


def right_vec(params: Parameters, x: int) -> list[int]:
    """Powers 1, x, ..., x^(cols*slots-1) (reference rightVec)."""
    p = params.spec.p
    out = [1] * (params.cols * params.slots)
    for i in range(1, len(out)):
        out[i] = out[i - 1] * x % p
    return out
