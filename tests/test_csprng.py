"""Sampler tests: AES-CTR stream semantics (incl. the reference's
buffer-XOR quirk), rejection bounds, and distribution sanity for the three
Gaussian samplers."""

import hashlib

import numpy as np
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

from ringo_tpu.csprng import (
    COSACSampler, RoundedGaussianSampler, TwinCDTGaussianSampler,
    UniformSampler, compute_cdt,
)
from ringo_tpu.utils.transcript import Shake128Stream, Transcript


def test_uniform_stream_matches_go_semantics():
    seed = b"Jindo!"
    s = UniformSampler(seed)
    got = s.sample_u64(2048)  # spans two 8 KiB refills
    # first-principles replay of uniform.go:38-79
    r = hashlib.sha384(seed).digest()
    enc = Cipher(algorithms.AES(r[:32]), modes.CTR(r[32:48])).encryptor()
    k1 = np.frombuffer(enc.update(bytes(8192)), dtype=np.uint8)
    k2 = np.frombuffer(enc.update(bytes(8192)), dtype=np.uint8)
    buf2 = k1 ^ k2  # buffer XORs keystream over previous contents
    want = np.concatenate([k1, buf2]).view("<u8")
    assert (got == want).all()


def test_uniform_deterministic_and_distinct():
    a = UniformSampler(b"seed-a").sample_u64(64)
    b = UniformSampler(b"seed-a").sample_u64(64)
    c = UniformSampler(b"seed-b").sample_u64(64)
    assert (a == b).all() and not (a == c).all()


def test_sample_n_bound():
    s = UniformSampler(b"x")
    n = 1073741953
    vals = s.sample_n(n, 4096)
    assert (vals < n).all()
    # same draws as raw stream mod n (no rejection occurred)
    s2 = UniformSampler(b"x")
    assert (vals == s2.sample_u64(4096) % np.uint64(n)).all()


def test_sample_float_range():
    f = UniformSampler(b"f").sample_float(4096)
    assert (f >= 0).all() and (f < 1).all()
    assert abs(f.mean() - 0.5) < 0.02


def test_rounded_gaussian_moments():
    g = RoundedGaussianSampler(b"g")
    x = g.sample(0.0, 3.2, 200_000).astype(np.float64)
    assert abs(x.mean()) < 0.05
    assert abs(x.std() - np.sqrt(3.2 ** 2 + 1 / 12)) < 0.08


def test_twin_cdt_moments_and_centers():
    sigma = 2.4
    g = TwinCDTGaussianSampler(sigma, b"t")
    x = g.sample(np.full(200_000, 0.37)).astype(np.float64)
    assert abs(x.mean() - 0.37) < 0.05
    assert abs(x.std() - sigma) < 0.08
    tbl = compute_cdt(0.0, sigma)
    assert tbl[-1] >= np.uint64(1) << np.uint64(63)  # CDF reaches ~1


def test_cosac_matches_reference_distribution():
    # NOTE: the reference COSAC (gaussian_cosac.go:30-37) admits yRound == 0
    # from both bimodal branches (cmp thresholds +/-0.5 on integers), which
    # inflates P(round(center)) ~2.5x over an ideal discrete Gaussian.  We are
    # bug-compatible; this test pins the *reference's* distribution: a scalar
    # transliteration of the Go loop gives mean ~0.244, std ~3.64,
    # P(0) ~0.258 at center=0.3, sigma=4.
    g = COSACSampler(b"c")
    x = g.sample(np.full(200_000, 0.3), 4.0).astype(np.float64)
    assert abs(x.mean() - 0.244) < 0.03
    assert abs(x.std() - 3.64) < 0.05
    assert abs((x == 0).mean() - 0.258) < 0.01


def test_shake_stream():
    s = Shake128Stream()
    s.write(b"hello")
    a = s.read(16) + s.read(16)
    assert a == hashlib.shake_128(b"hello").digest(32)
    s.reset()
    s.write(b"hello")
    assert s.read(32) == a


def test_transcript_order_and_binding():
    t = Transcript(["a", "b", "c"])
    t.bind("a", b"x")
    t.bind("b", b"y")
    va = t.compute_challenge("a")
    vb = t.compute_challenge("b")
    assert va != vb
    # same inputs -> same values
    t2 = Transcript(["a", "b", "c"])
    t2.bind("a", b"x")
    t2.bind("b", b"y")
    assert t2.compute_challenge("b") == vb  # auto-computes "a" first
    # different binding -> different challenge
    t3 = Transcript(["a", "b", "c"])
    t3.bind("a", b"z")
    t3.bind("b", b"y")
    assert t3.compute_challenge("b") != vb


def test_chacha_keystream_batch_matches_loop():
    """keystream_u32_batch == T independent keystream_u32 calls, on numpy
    and on the jax vectorized path."""
    import numpy as np

    from ringo_tpu.csprng import chacha

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 32, (5, 8), dtype=np.uint32)
    nb = 7
    want = np.stack([chacha.keystream_u32(keys[i], nb) for i in range(5)])
    got = chacha.keystream_u32_batch(keys, nb)
    np.testing.assert_array_equal(got, want)

    import jax.numpy as jnp
    got_j = np.asarray(chacha.keystream_u32_batch(jnp.asarray(keys), nb,
                                                  xp=jnp))
    np.testing.assert_array_equal(got_j, want)
