"""Bit-exact agreement with Go-generated golden vectors (SURVEY §4(c)).

The fixture files are produced by the Go reference (see
tests/fixtures/README.md); no Go toolchain exists in this environment, so
each test skips until its file is checked in.
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _need(name):
    path = os.path.join(FIX, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated (needs a Go toolchain)")
    return path


def test_aes_ctr_stream_matches_go():
    from ringo_tpu.csprng import UniformSampler

    path = _need("aes_ctr_stream.bin")
    want = open(path, "rb").read()
    u = UniformSampler(b"Jindo!")
    got = bytes(u._take_bytes(len(want)))
    assert got == want


def test_commit_key_head_matches_go():
    from ringo_tpu import jindo
    from ringo_tpu.fields import ZP255

    path = _need("commit_key_head.bin")
    want = np.frombuffer(open(path, "rb").read(), dtype="<u8")
    params = jindo.new_parameters(ZP255, 1 << 10, 1)
    # NOTE: commitment-ring primes differ by design (30-bit vs lattigo's
    # ~60-bit), so only the raw u64 draw stream can match; regenerate the
    # fixture against the draw sequence, not the reduced residues.
    from ringo_tpu.csprng import UniformSampler
    u = UniformSampler(b"Jindo!")
    got = u.sample_u64(len(want))
    np.testing.assert_array_equal(got, want)


def test_challenge_stream_matches_go():
    from ringo_tpu.utils.transcript import Shake128Stream

    path = _need("challenge_stream.bin")
    want = open(path, "rb").read()
    s = Shake128Stream()
    s.write(b"Jindo!")
    s.write(b"\x00" * 64)
    s.write((1).to_bytes(32, "big"))
    got = s.read(len(want))
    assert got == want
