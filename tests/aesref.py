"""From-spec AES (FIPS-197) + CTR mode (NIST SP 800-38A) in pure Python.

An INDEPENDENT second implementation of the primitives behind
ringo_tpu.csprng.UniformSampler (which uses pyca/cryptography): the S-box is
derived from the GF(2^8) inverse + affine map, the key schedule and rounds
follow the FIPS-197 pseudocode, and CTR increments the full 16-byte counter
big-endian (SP 800-38A / Go crypto/cipher.NewCTR semantics).

Used by tests/test_go_vectors.py and tests/fixtures/gen_py/make_fixtures.py
to generate/check golden vectors with documented NIST provenance: both this
implementation and Go's crypto/aes satisfy the same FIPS-197 / SP 800-38A
known-answer tests (asserted in selfcheck()), so byte agreement of the
seeded streams here is byte agreement with the Go reference's
math/csprng/uniform.go:38-54 construction.
"""

from __future__ import annotations

# ---------------------------------------------------------------- GF(2^8)

_POLY = 0x11B  # x^8 + x^4 + x^3 + x + 1 (FIPS-197 §4.2)


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= _POLY
        b >>= 1
    return r


def _build_sbox():
    # multiplicative inverse table by brute force (256 elements)
    inv = [0] * 256
    for a in range(1, 256):
        for b in range(1, 256):
            if _gmul(a, b) == 1:
                inv[a] = b
                break
    sbox = [0] * 256
    for a in range(256):
        x = inv[a]
        y = 0
        for i in range(8):
            bit = ((x >> i) ^ (x >> ((i + 4) % 8)) ^ (x >> ((i + 5) % 8))
                   ^ (x >> ((i + 6) % 8)) ^ (x >> ((i + 7) % 8))
                   ^ (0x63 >> i)) & 1
            y |= bit << i
        sbox[a] = y
    return sbox


_SBOX = _build_sbox()


def _sub_word(w: int) -> int:
    return ((_SBOX[(w >> 24) & 0xFF] << 24) | (_SBOX[(w >> 16) & 0xFF] << 16)
            | (_SBOX[(w >> 8) & 0xFF] << 8) | _SBOX[w & 0xFF])


def _rot_word(w: int) -> int:
    return ((w << 8) | (w >> 24)) & 0xFFFFFFFF


def _expand_key(key: bytes):
    """FIPS-197 §5.2 key expansion; supports Nk = 4 (AES-128) and 8
    (AES-256)."""
    nk = len(key) // 4
    assert nk in (4, 8), "AES-128 or AES-256 only"
    nr = nk + 6
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = _sub_word(_rot_word(t)) ^ (rcon << 24)
            rcon = _gmul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = _sub_word(t)
        w.append(w[i - nk] ^ t)
    return w, nr


def _encrypt_block(w, nr: int, block: bytes) -> bytes:
    # state[c][r]: column-major per FIPS-197 §3.4
    s = [[block[4 * c + r] for r in range(4)] for c in range(4)]

    def add_round_key(rnd):
        for c in range(4):
            k = w[4 * rnd + c]
            for r in range(4):
                s[c][r] ^= (k >> (24 - 8 * r)) & 0xFF

    add_round_key(0)
    for rnd in range(1, nr + 1):
        # SubBytes
        for c in range(4):
            for r in range(4):
                s[c][r] = _SBOX[s[c][r]]
        # ShiftRows: row r rotates left by r
        rows = [[s[c][r] for c in range(4)] for r in range(4)]
        for r in range(4):
            rows[r] = rows[r][r:] + rows[r][:r]
        for c in range(4):
            for r in range(4):
                s[c][r] = rows[r][c]
        # MixColumns (skipped in the final round)
        if rnd < nr:
            for c in range(4):
                a = s[c]
                s[c] = [
                    _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3],
                    a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3],
                    a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3),
                    _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2),
                ]
        add_round_key(rnd)
    return bytes(s[c][r] for c in range(4) for r in range(4))


class AES:
    def __init__(self, key: bytes):
        self._w, self._nr = _expand_key(key)

    def encrypt_block(self, block: bytes) -> bytes:
        assert len(block) == 16
        return _encrypt_block(self._w, self._nr, block)


class CTR:
    """SP 800-38A CTR keystream: encrypt successive counter blocks; the
    16-byte counter increments as one big-endian integer (Go cipher.NewCTR
    behavior)."""

    def __init__(self, key: bytes, iv: bytes):
        assert len(iv) == 16
        self._aes = AES(key)
        self._ctr = int.from_bytes(iv, "big")
        self._pending = b""

    def keystream(self, n: int) -> bytes:
        out = bytearray(self._pending[:n])
        self._pending = self._pending[n:]
        while len(out) < n:
            block = self._aes.encrypt_block(
                (self._ctr & ((1 << 128) - 1)).to_bytes(16, "big"))
            self._ctr += 1
            take = min(16, n - len(out))
            out += block[:take]
            self._pending = block[take:]
        return bytes(out)

    def xor(self, data: bytes) -> bytes:
        ks = self.keystream(len(data))
        return bytes(a ^ b for a, b in zip(data, ks))


class GoUniformSampler:
    """The reference math/csprng/uniform.go sampler, rebuilt on the
    from-spec AES above: seed -> SHA-384 -> AES-256 key || CTR IV; 8 KiB
    buffer refilled by XORing fresh keystream over its previous contents
    (uniform.go:66-69); Sample() = 8 LE bytes; SampleN = per-value
    rejection with bound = MaxUint64 - MaxUint64 % n (uniform.go:87-96)."""

    BUF = 8192

    def __init__(self, seed: bytes):
        import hashlib
        r = hashlib.sha384(seed).digest()
        self._ctr = CTR(r[:32], r[32:48])
        self._buf = bytearray(self.BUF)
        self._ptr = self.BUF

    def read(self, n: int) -> bytes:
        """io.Reader path: plain keystream (XOR over caller zeros)."""
        return self._ctr.keystream(n)

    def sample(self) -> int:
        if self._ptr == self.BUF:
            ks = self._ctr.keystream(self.BUF)
            self._buf = bytearray(a ^ b for a, b in zip(self._buf, ks))
            self._ptr = 0
        r = int.from_bytes(self._buf[self._ptr:self._ptr + 8], "little")
        self._ptr += 8
        return r

    def sample_n(self, n: int) -> int:
        bound = 0xFFFFFFFFFFFFFFFF - 0xFFFFFFFFFFFFFFFF % n
        while True:
            r = self.sample()
            if r < bound:
                return r % n


# ------------------------------------------------------------ NIST vectors

def selfcheck():
    """Known-answer tests: FIPS-197 App. C.1/C.3 block vectors and
    SP 800-38A F.5.1/F.5.5 CTR vectors.  Raises AssertionError on any
    mismatch."""
    # FIPS-197 C.1 (AES-128)
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    assert AES(k128).encrypt_block(pt) == bytes.fromhex(
        "69c4e0d86a7b0430d8cdb78070b4c55a")
    # FIPS-197 C.3 (AES-256)
    k256 = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                         "101112131415161718191a1b1c1d1e1f")
    assert AES(k256).encrypt_block(pt) == bytes.fromhex(
        "8ea2b7ca516745bfeafc49904b496089")
    # SP 800-38A F.5.1 CTR-AES128.Encrypt
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt4 = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710")
    ct4 = bytes.fromhex(
        "874d6191b620e3261bef6864990db6ce"
        "9806f66b7970fdff8617187bb9fffdff"
        "5ae4df3edbd5d35e5b4f09020db03eab"
        "1e031dda2fbe03d1792170a0f3009cee")
    assert CTR(key, iv).xor(pt4) == ct4
    # SP 800-38A F.5.5 CTR-AES256.Encrypt
    key = bytes.fromhex("603deb1015ca71be2b73aef0857d7781"
                        "1f352c073b6108d72d9810a30914dff4")
    ct4 = bytes.fromhex(
        "601ec313775789a5b7a7f504bbf3d228"
        "f443e3ca4d62b59aca84e990cacaf5c5"
        "2b0930daa23de94ce87017ba2d84988d"
        "dfc9c58db67aada613c2dd08457941a6")
    assert CTR(key, iv).xor(pt4) == ct4


selfcheck()
