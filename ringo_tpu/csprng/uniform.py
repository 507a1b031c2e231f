"""AES-CTR uniform sampler, bit-compatible with the reference
(math/csprng/uniform.go): seed -> SHA-384 -> AES-256 key || CTR IV; the
8 KiB refill buffer XORs new keystream into its previous contents (the
reference XORKeyStreams the buffer over itself), and Sample() consumes 8
little-endian bytes.  CRS expansion (jindo CommitKey) therefore produces the
same streams as the Go implementation for the same seed.

Batch APIs return numpy arrays.  Rejection sampling (sample_n) draws a whole
block; if anything was rejected (probability <= n/2^64 per draw) the stream is
rewound and replayed in exact scalar order, so results always match the
reference's sequential semantics.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

BUF_SIZE = 8192
FLOAT_PREC = 52
_U64_MAX = (1 << 64) - 1


class UniformSampler:
    def __init__(self, seed: bytes | None = None):
        if seed is None:
            seed = os.urandom(32)
        r = hashlib.sha384(seed).digest()
        self._key = r[:32]
        self._iv = r[32:48]
        self._enc = Cipher(algorithms.AES(self._key), modes.CTR(self._iv)).encryptor()
        self._consumed = 0  # keystream bytes consumed so far
        self._buf = np.zeros(BUF_SIZE, dtype=np.uint8)
        self._ptr = BUF_SIZE

    # -- keystream plumbing --------------------------------------------------

    def _keystream(self, n: int) -> bytes:
        self._consumed += n
        return self._enc.update(bytes(n))

    def _refill(self):
        ks = np.frombuffer(self._keystream(BUF_SIZE), dtype=np.uint8)
        self._buf = self._buf ^ ks  # reference XORs keystream over old buffer
        self._ptr = 0

    def _snapshot(self):
        return (self._consumed, self._buf.copy(), self._ptr)

    def _restore(self, snap):
        consumed, buf, ptr = snap
        self._enc = Cipher(algorithms.AES(self._key), modes.CTR(self._iv)).encryptor()
        self._consumed = 0
        if consumed:
            self._keystream(consumed)
        self._buf = buf.copy()
        self._ptr = ptr

    def read(self, data: bytes) -> bytes:
        """io.Reader semantics: XOR keystream over ``data`` (bypasses the
        buffer, like the reference's Read)."""
        ks = self._keystream(len(data))
        return bytes(a ^ b for a, b in zip(data, ks))

    def _take_bytes(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint8)
        filled = 0
        while filled < n:
            if self._ptr == BUF_SIZE:
                self._refill()
            take = min(n - filled, BUF_SIZE - self._ptr)
            out[filled:filled + take] = self._buf[self._ptr:self._ptr + take]
            self._ptr += take
            filled += take
        return out

    # -- sampling ------------------------------------------------------------

    def sample(self) -> int:
        return int(self.sample_u64(1)[0])

    def sample_u64(self, count: int) -> np.ndarray:
        raw = self._take_bytes(8 * count)
        return raw.view("<u8")

    def sample_n(self, n: int, count: int = 1) -> np.ndarray:
        """count uniform draws in [0, n), exact reference SampleN order."""
        n = int(n)
        bound = _U64_MAX - _U64_MAX % n
        snap = self._snapshot()
        block = self.sample_u64(count)
        if bool((block < np.uint64(bound)).all()):
            return block % np.uint64(n)
        # rare path: replay sequentially with per-value rejection
        self._restore(snap)
        out = np.empty(count, dtype=np.uint64)
        for i in range(count):
            r = self.sample()
            while r >= bound:
                r = self.sample()
            out[i] = r % n
        return out

    def sample_float(self, count: int = 1) -> np.ndarray:
        """Uniform floats in [0, 1) at 52-bit precision (reference
        SampleFloat)."""
        r = self.sample_u64(count) % np.uint64(1 << FLOAT_PREC)
        bits = r | np.uint64((1023 + FLOAT_PREC) << FLOAT_PREC)
        return bits.view(np.float64) / float(1 << FLOAT_PREC) - 1.0
