"""Bit-exact agreement with vendored golden vectors (SURVEY §4(c)).

No Go toolchain exists in any build environment this project has seen, so
the fixtures are vendored with NIST provenance instead of skipped forever
(VERDICT r3 missing #1): tests/fixtures/gen_py/make_fixtures.py generates
them from tests/aesref.py — an independent from-FIPS-197 AES + SP 800-38A
CTR implementation that must pass the official NIST known-answer vectors
before any fixture is written — plus hashlib's FIPS-202 SHAKE128.  Go's
crypto/aes, crypto/cipher and x/crypto/sha3 implement the same
specifications and pass the same KATs, so byte agreement here is byte
agreement with the constructions of math/csprng/uniform.go:38-96 and the
draw mechanics of jindo/entities.go:21-73.

tests/fixtures/gen/main.go remains the true-Go generator; run it in any
environment with a Go toolchain to regenerate aes_ctr_stream.bin straight
from the reference binary (byte-identical by construction).
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _need(name):
    path = os.path.join(FIX, name)
    if not os.path.exists(path):  # pragma: no cover — fixtures are vendored
        pytest.skip(f"fixture {name} missing (python tests/fixtures/"
                    "gen_py/make_fixtures.py regenerates it)")
    return path


SEED = b"Jindo!" + b"\x00" * 26  # gen/main.go seed32(): zero-padded to 32


def test_aesref_passes_nist_kats():
    """The fixture generator's AES must satisfy FIPS-197 App. C and
    SP 800-38A F.5 known-answer vectors (provenance anchor)."""
    import aesref

    aesref.selfcheck()


def test_aes_ctr_stream_matches_reference_construction():
    """UniformSampler (pyca/cryptography path) == the vendored keystream
    (from-spec AES path) == Go's io.Reader stream for the same seed
    (math/csprng/uniform.go:38-61)."""
    from ringo_tpu.csprng import UniformSampler

    want = open(_need("aes_ctr_stream.bin"), "rb").read()
    u = UniformSampler(SEED)
    got = u.read(bytes(len(want)))
    assert got == want
    # the buffered path serves the identical bytes (first refill XORs
    # keystream over the all-zero buffer)
    u2 = UniformSampler(SEED)
    assert bytes(u2._take_bytes(len(want))) == want


def test_samplen_draw_sequence_matches_reference_semantics():
    """SampleN rejection bound, modulo, and k-major/level-minor draw order
    (uniform.go:87-96 + the CommitKey expansion loop of
    jindo/entities.go:21-73) against the independent implementation."""
    from ringo_tpu.csprng import UniformSampler

    raw = open(_need("samplen_draws.bin"), "rb").read()
    nm = int.from_bytes(raw[:4], "little")
    moduli = [int.from_bytes(raw[4 + 8 * i:12 + 8 * i], "little")
              for i in range(nm)]
    off = 4 + 8 * nm
    nd = int.from_bytes(raw[off:off + 4], "little")
    draws = np.frombuffer(raw[off + 4:], dtype="<u8")
    assert len(draws) == nd

    u = UniformSampler(SEED)
    got = []
    while len(got) < nd:
        for m in moduli:
            if len(got) == nd:
                break
            got.append(int(u.sample_n(m)[0]))
    np.testing.assert_array_equal(np.array(got, dtype=np.uint64), draws)
    # the fixture must actually exercise the rejection loop: the just-above-
    # 2^63 modulus rejects ~half the draws, so consecutive-u64 replay differs
    s2 = UniformSampler(SEED)
    consecutive = [int(r % np.uint64(m)) for r, m in zip(
        s2.sample_u64(nd), (moduli * (nd // len(moduli) + 1))[:nd])]
    assert consecutive != got


def test_challenge_stream_matches_oracle_framing():
    """Shake128Stream's incremental squeezing == one-shot hashlib FIPS-202
    SHAKE128 over the byte framing this framework feeds the evaluation
    oracle (jindo/prover.go:220-225's structure: CRS || commitment bytes
    || Marshal(x)).  This validates the SHAKE stream WRAPPER (incremental
    vs one-shot, absorb boundaries) against an independent implementation
    (hashlib) — NOT the Go oracle's exact byte framing, which depends on
    lattigo's Poly.WriteTo layout (a documented serialization non-goal,
    see PARITY.md; the fixture bytes were generated with this repo's own
    serialization)."""
    from ringo_tpu import jindo
    from ringo_tpu.fields import ZP255
    from ringo_tpu.utils.transcript import Shake128Stream

    want = open(_need("challenge_stream.bin"), "rb").read()
    params = jindo.new_parameters(ZP255, 1 << 10, 1)
    com = jindo.Commitment(params)  # zero commitment
    s = Shake128Stream()
    s.write(SEED)
    s.write(com.raw_bytes())
    s.write(params.spec.marshal(1))
    # incremental squeeze must agree with the one-shot digest
    got = s.read(100) + s.read(156)
    assert got == want
