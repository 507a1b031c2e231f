"""Vectorized ChaCha20 keystream — a device-side CSPRNG.

The commit path needs ~8 bytes of uniform entropy per encode coefficient
(the twin-CDT search threshold).  Shipping host AES-CTR bytes over the
host<->TPU link costs more than the whole commit compute, so the device
generates the keystream itself: ChaCha20 (djb variant, 64-bit counter) is
pure 32-bit adds/xors/rotates — exactly the VPU's native ops, no table
lookups — and each 64-byte block is independent, so the block axis
vectorizes.  Keys are drawn per use from the host AES-CTR stream
(seed -> SHA-384 -> AES-256-CTR, csprng/uniform.py), so the security
reduction chains AES -> ChaCha20.

Verified byte-exact against the `cryptography` package's ChaCha20
(tests/test_csprng.py).
"""

from __future__ import annotations

import numpy as np

CONSTANTS = np.array([0x61707865, 0x3320646E, 0x79622D32, 0x6B206574],
                     dtype=np.uint32)


def _rotl(xp, x, r: int):
    return (x << xp.uint32(r)) | (x >> xp.uint32(32 - r))


def _quarter(xp, a, b, c, d):
    a = a + b
    d = _rotl(xp, d ^ a, 16)
    c = c + d
    b = _rotl(xp, b ^ c, 12)
    a = a + b
    d = _rotl(xp, d ^ a, 8)
    c = c + d
    b = _rotl(xp, b ^ c, 7)
    return a, b, c, d


_COLUMNS = [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15)]
_DIAGONALS = [(0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]


def keystream_u32(key: np.ndarray, n_blocks: int, counter0: int = 0,
                  nonce: tuple[int, int] = (0, 0), xp=np):
    """ChaCha20 keystream as uint32 words [n_blocks, 16] (little-endian word
    order within each 64-byte block).  ``key``: uint32[8].  Traceable: pass
    xp=jax.numpy to run inside jit."""
    if xp is not np and counter0 == 0 and nonce == (0, 0):
        from .. import backend
        if backend.use_pallas():
            from ..ops.chacha_pallas import keystream_u32_pallas
            return keystream_u32_pallas(xp.asarray(key, dtype=xp.uint32),
                                        n_blocks)
    return _keystream_u32_vec(key, n_blocks, counter0, nonce, xp)


def _keystream_u32_vec(key, n_blocks: int, counter0, nonce, xp):
    """Vectorized keystream; ``key`` uint32[8] -> [n_blocks, 16], or a
    batch uint32[T, 8] -> [T, n_blocks, 16] (independent streams, each
    starting at counter0 — the batched form of T separate calls)."""
    batched = getattr(key, "ndim", 1) == 2
    T = key.shape[0] if batched else 1
    idx = xp.arange(n_blocks, dtype=xp.uint32)
    ctr_lo = xp.uint32(counter0 & 0xFFFFFFFF) + idx  # wraps mod 2^32
    carry = (ctr_lo < xp.uint32(counter0 & 0xFFFFFFFF)).astype(xp.uint32)
    ctr_hi = xp.uint32((counter0 >> 32) & 0xFFFFFFFF) + carry
    shape = (T, n_blocks) if batched else (n_blocks,)
    ones = xp.ones(shape, dtype=xp.uint32)
    state = [ones * xp.uint32(int(c)) for c in CONSTANTS]
    kk = xp.asarray(key, dtype=xp.uint32)
    for i in range(8):
        ki = kk[:, i][:, None] if batched else kk[i]
        state.append(ones * ki)
    state += [ones * ctr_lo, ones * ctr_hi, ones * xp.uint32(nonce[0]),
              ones * xp.uint32(nonce[1])]
    x = list(state)
    for _ in range(10):  # 20 rounds = 10 double-rounds
        for (a, b, c, d) in _COLUMNS:
            x[a], x[b], x[c], x[d] = _quarter(xp, x[a], x[b], x[c], x[d])
        for (a, b, c, d) in _DIAGONALS:
            x[a], x[b], x[c], x[d] = _quarter(xp, x[a], x[b], x[c], x[d])
    out = [xi + si for xi, si in zip(x, state)]
    return xp.stack(out, axis=-1)  # [..., n_blocks, 16]


def keystream_u32_batch(keys, n_blocks: int, xp=np):
    """T independent keystreams [T, 8] -> [T, n_blocks, 16], bit-identical
    to T ``keystream_u32`` calls.  One traced graph for the whole batch on
    the vectorized path; the TPU Pallas kernel runs per key (its grid is
    already the block axis)."""
    if xp is not np:
        from .. import backend
        if backend.use_pallas():
            from ..ops.chacha_pallas import keystream_u32_pallas
            return xp.stack([keystream_u32_pallas(
                xp.asarray(keys[i], dtype=xp.uint32), n_blocks)
                for i in range(keys.shape[0])])
    return _keystream_u32_vec(keys, n_blocks, 0, (0, 0), xp)


def keystream_u64(key: np.ndarray, count: int, counter0: int = 0,
                  nonce: tuple[int, int] = (0, 0), xp=np):
    """count uniform uint64 values (consecutive little-endian word pairs)."""
    n_blocks = -(-count // 8)
    w = keystream_u32(key, n_blocks, counter0, nonce, xp).reshape(-1)
    lo = w[0::2].astype(xp.uint64)
    hi = w[1::2].astype(xp.uint64)
    return (lo | (hi << xp.uint64(32)))[:count]


def key_from_bytes(raw: bytes) -> np.ndarray:
    """32 bytes -> uint32[8] little-endian (the standard key layout)."""
    if len(raw) != 32:
        raise ValueError("ChaCha20 key must be 32 bytes")
    return np.frombuffer(raw, dtype="<u4").astype(np.uint32)
