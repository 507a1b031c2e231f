"""Device twin-CDT sampling must reproduce the host sampler exactly: the
fast path (table binary search) and the disagreement resolution are the same
math, so given identical uniform entropy the outputs are bit-identical.
Also covers the packed-int32 fix-up marshalling (bitcasts of f64/u64)."""

import numpy as np
import pytest

from ringo_tpu.csprng import chacha
from ringo_tpu.csprng.gaussian import TwinCDTDevice, TwinCDTGaussianSampler


def _host_sample_with_u(host, centers, u):
    """Replicate TwinCDTGaussianSampler.sample with injected entropy."""
    class _FakeBase:
        def sample_u64(self, n):
            assert n == len(u)
            return u
    saved = host.base
    host.base = _FakeBase()
    try:
        return host.sample(centers)
    finally:
        host.base = saved


@pytest.mark.parametrize("sigma", [12.000331, 16.97056])
def test_device_search_matches_host(sigma):
    rng = np.random.default_rng(5)
    n = 20000
    centers = rng.normal(0, 0.8, n)
    u = rng.integers(0, 1 << 63, n).astype(np.uint64) * 2 + 1

    host = TwinCDTGaussianSampler(sigma, b"s")
    want = _host_sample_with_u(host, centers, u)

    dev = TwinCDTDevice(sigma)
    prov, agree, c_floor, c_frac, v0, v1 = dev.search(centers, u)
    got = np.asarray(prov).copy()
    bad = np.nonzero(~np.asarray(agree))[0]
    assert 0 < len(bad) < n // 20  # disagreements exist but are rare
    got[bad] = dev.resolve_host(c_frac[bad], u[bad], v0[bad], v1[bad],
                                c_floor[bad])
    np.testing.assert_array_equal(got, want)


def test_device_search_matches_host_jax_backend():
    """Same equality with the search traced under jit (CPU), including the
    packed bitcast marshalling used by the prover."""
    import jax
    import jax.numpy as jnp

    sigma = 12.000331
    rng = np.random.default_rng(6)
    n = 8192
    centers = rng.normal(0, 0.8, n)
    u = rng.integers(0, 1 << 63, n).astype(np.uint64) * 2 + 1

    dev = TwinCDTDevice(sigma)

    CAP = 1024

    @jax.jit
    def run(c_, u_):
        prov, agree, c_floor, c_frac, v0, v1 = dev.search(c_, u_)
        (idx,) = jnp.nonzero(~agree, size=CAP, fill_value=n)
        safe = jnp.minimum(idx, n - 1)
        g = lambda a: jnp.take(a, safe)
        cfb = g(c_frac)
        s32 = 4294967296.0
        cf_hi = jnp.floor(cfb * s32)
        cf_lo = jnp.floor((cfb * s32 - cf_hi) * s32)
        ub = g(u_)
        packed = jnp.stack([
            idx.astype(jnp.uint32), g(v0).astype(jnp.uint32),
            g(v1).astype(jnp.uint32),
            g(c_floor).astype(jnp.int32).astype(jnp.uint32),
            cf_hi.astype(jnp.uint32), cf_lo.astype(jnp.uint32),
            (ub & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (ub >> jnp.uint64(32)).astype(jnp.uint32),
        ], axis=0)
        return prov, packed

    prov, packed = run(centers, u)
    got = np.asarray(prov).copy()
    ph = np.asarray(packed)
    fix_idx = ph[0].astype(np.int64)
    count = int((fix_idx < n).sum())
    assert 0 < count < CAP
    cfrac_b = (ph[4, :count].astype(np.float64) * 2.0 ** -32
               + ph[5, :count].astype(np.float64) * 2.0 ** -64)
    u_b = (ph[6, :count].astype(np.uint64)
           | (ph[7, :count].astype(np.uint64) << np.uint64(32)))
    fix = dev.resolve_host(cfrac_b, u_b, ph[1, :count].astype(np.int64),
                           ph[2, :count].astype(np.int64),
                           ph[3, :count].view(np.int32))
    got[fix_idx[:count]] = fix

    host = TwinCDTGaussianSampler(sigma, b"s")
    want = _host_sample_with_u(host, centers, u)
    np.testing.assert_array_equal(got, want)


def test_chacha_matches_cryptography():
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = bytes(range(32))
    for ctr, nonce in [(0, (0, 0)), (7, (0xDEADBEEF, 0x01020304))]:
        full_nonce = (int(ctr).to_bytes(8, "little")
                      + int(nonce[0]).to_bytes(4, "little")
                      + int(nonce[1]).to_bytes(4, "little"))
        enc = Cipher(algorithms.ChaCha20(key, full_nonce), mode=None).encryptor()
        ref = np.frombuffer(enc.update(bytes(64 * 5)), dtype="<u4").reshape(5, 16)
        ours = chacha.keystream_u32(chacha.key_from_bytes(key), 5, ctr, nonce)
        np.testing.assert_array_equal(ref, ours)


def test_chacha_jit_matches_numpy():
    import jax
    import jax.numpy as jnp

    key = chacha.key_from_bytes(bytes(range(32)))
    want = chacha.keystream_u64(key, 1000, 3, (1, 2))
    got = jax.jit(lambda k: chacha.keystream_u64(k, 1000, 3, (1, 2), xp=jnp))(key)
    np.testing.assert_array_equal(want, np.asarray(got))
