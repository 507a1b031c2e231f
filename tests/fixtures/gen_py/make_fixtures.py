"""Golden-fixture generator with NIST provenance (no Go toolchain needed).

No Go toolchain exists in any build environment this project has seen, so
the cross-implementation fixtures are generated from tests/aesref.py — a
from-FIPS-197 AES + SP 800-38A CTR implementation that passes the official
NIST known-answer vectors (aesref.selfcheck()), plus hashlib's FIPS-202
SHAKE128.  Go's crypto/aes, crypto/cipher and x/crypto/sha3 satisfy the
same specifications and KATs, so agreement with these fixtures is
agreement with the Go reference's constructions:

* aes_ctr_stream.bin  — math/csprng/uniform.go:38-54 (seed -> SHA-384 ->
  AES-256-CTR keystream), io.Reader path, seed "Jindo!" zero-padded to 32.
* samplen_draws.bin   — the SampleN rejection semantics + k-major/
  level-minor draw order of jindo/entities.go:21-73 over a chain of
  60-bit NTT-friendly moduli (the reference's modulus grain, found by the
  same descending search lattigo uses), format:
  u32 n_moduli | n_moduli x u64 moduli | u32 n_draws | n_draws x u64.
* challenge_stream.bin — the SHAKE128 evaluation oracle framing of
  jindo/prover.go:220-225: CRS(32) || zero outer commitment bytes ||
  Marshal(x=1), 256 bytes of output.

tests/fixtures/gen/main.go remains the true-Go generator; fixtures it
produces for the first file are byte-identical by construction.

Run from the repo root:  python tests/fixtures/gen_py/make_fixtures.py
"""

import os
import sys
import hashlib

REPO = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

import aesref  # noqa: E402  (runs NIST selfcheck on import)

OUT = os.path.join(REPO, "tests", "fixtures")
SEED = b"Jindo!" + b"\x00" * 26  # gen/main.go seed32()


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24 (fixed witness set)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def ntt_friendly_primes(bits: int, order: int, count: int, up: bool = False):
    """First `count` primes p = 1 (mod order) descending (or, with up=True,
    ascending) from 2^bits (lattigo NTTFriendlyPrimesGenerator
    NextDownstream/NextUpstreamPrimes semantics — the reference's 60-bit
    modulus grain, jindo/params.go:279-301)."""
    out = []
    p = (1 << bits) + 1
    step = order if up else -order
    while len(out) < count:
        p += step
        if is_prime(p):
            out.append(p)
    return out


def gen_aes_ctr_stream():
    s = aesref.GoUniformSampler(SEED)
    data = s.read(4096)
    with open(os.path.join(OUT, "aes_ctr_stream.bin"), "wb") as f:
        f.write(data)
    return data


def gen_samplen_draws():
    moduli = ntt_friendly_primes(60, 1 << 12, 3)
    # small moduli exercise the modulo path; 2^64-1 % 3 == 0 makes the
    # bound MaxUint64 itself (rejects only the all-ones draw); a prime just
    # ABOVE 2^63 makes bound == m with per-draw rejection ~(2^64-m)/2^64
    # ≈ 1/2, so the rejection loop is actually taken within 64 draws
    moduli += [3, 12289] + ntt_friendly_primes(63, 1 << 12, 1, up=True)
    assert all(is_prime(m) for m in moduli)
    n_draws = 64
    s = aesref.GoUniformSampler(SEED)
    draws = []
    k = 0
    while len(draws) < n_draws:
        for m in moduli:
            if len(draws) == n_draws:
                break
            draws.append(s.sample_n(m))
        k += 1
    buf = bytearray()
    buf += len(moduli).to_bytes(4, "little")
    for m in moduli:
        buf += m.to_bytes(8, "little")
    buf += n_draws.to_bytes(4, "little")
    for d in draws:
        buf += d.to_bytes(8, "little")
    with open(os.path.join(OUT, "samplen_draws.bin"), "wb") as f:
        f.write(buf)
    return moduli, draws


def gen_challenge_stream():
    """SHAKE128(CRS || zero-commitment bytes || Marshal(1)) via hashlib —
    an INDEPENDENT-IMPLEMENTATION check of the Shake128Stream wrapper
    (incremental vs one-shot squeezing), not a Go cross-vector: the byte
    framing uses this framework's canonical poly serialization (documented
    non-goal: NOT lattigo's WriteTo layout, so the Go oracle's exact
    stream is not reproducible here; see PARITY.md)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ringo_tpu import jindo
    from ringo_tpu.fields import ZP255

    params = jindo.new_parameters(ZP255, 1 << 10, 1)
    com = jindo.Commitment(params)  # zero
    h = hashlib.shake_128()
    h.update(SEED)
    h.update(com.raw_bytes())
    h.update(params.spec.marshal(1))
    data = h.digest(256)
    with open(os.path.join(OUT, "challenge_stream.bin"), "wb") as f:
        f.write(data)
    return data


if __name__ == "__main__":
    ks = gen_aes_ctr_stream()
    print("aes_ctr_stream.bin  head:", ks[:8].hex())
    moduli, draws = gen_samplen_draws()
    print("samplen_draws.bin   moduli:", moduli, "head:", draws[:4])
    cs = gen_challenge_stream()
    print("challenge_stream.bin head:", cs[:8].hex())
