"""Challenge encodings and evaluation vectors (reference jindo/utils.go)."""

from __future__ import annotations

import numpy as np

from .params import Parameters


def encode_challenge(params: Parameters, ring, chal_bytes: bytes) -> np.ndarray:
    """128-bit challenge -> sparse signed ring polynomial, MForm+NTT
    (reference encodeChallengeTo, jindo/utils.go:21-46): the challenge is
    decomposed in base ChallengeBound with balanced digits placed at slot
    boundaries i*slots."""
    p = params
    c = (int.from_bytes(chal_bytes[8:16], "big") << 64) | int.from_bytes(chal_bytes[:8], "big")
    bound = p.challenge_bound
    coeffs = np.zeros((1, p.degree), dtype=np.int64)
    for i in range(p.exp):
        c, r = divmod(c, bound)
        if r > bound // 2:
            coeffs[0, i * p.slots] = -(bound - r)
        else:
            coeffs[0, i * p.slots] = r
    poly = ring.embed_int64(coeffs)
    return ring.ntt(ring.mform(poly))


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
