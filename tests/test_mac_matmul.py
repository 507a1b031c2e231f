"""MXU MAC contraction vs scan-of-mont_mul bit-equality."""

import numpy as np
import pytest

from ringo_tpu.ops import mac_matmul
from ringo_tpu.rings.rns import RnsRing, ntt_friendly_primes


@pytest.fixture(scope="module")
def ring():
    d = 64
    return RnsRing(d, ntt_friendly_primes(30, 2 * d, 3))


def _rand_poly(ring, rng, *batch):
    res = rng.integers(0, np.array(ring.primes, dtype=np.uint64
                                   ).reshape(-1, *([1] * (len(batch) + 1))),
                       size=(ring.L, *batch, ring.d), dtype=np.uint64)
    return ring.from_u64(res)


def _scan_reference(ring, key, x):
    """com[2, L, J, n, d] = sum_k mul_mont(key[..k..], x[..k..])."""
    J, K, n = key.shape[2], key.shape[3], x.shape[2]
    acc = None
    for k in range(K):
        a = key[:, :, :, k, :][:, :, :, None, :]      # [2, L, J, 1, d]
        b = x[:, :, k, :, :][:, :, None, :, :]        # [2, L, 1, n, d]
        t = ring.mul_mont(a, b)
        acc = t if acc is None else ring.add(acc, t)
    return acc


@pytest.mark.parametrize("J,K,n", [(3, 7, 2), (2, 17, 1), (1, 5, 4)])
def test_mod_mac_matches_scan(ring, J, K, n):
    rng = np.random.default_rng(J * 100 + K)
    key = _rand_poly(ring, rng, J, K)
    x = _rand_poly(ring, rng, K, n)
    kp = mac_matmul.fold_key(ring, key, np)
    got = mac_matmul.mod_mac(ring, kp, x, np)
    want = _scan_reference(ring, key, x)
    np.testing.assert_array_equal(got, want)


def test_mod_mac_chunked(ring):
    """Contraction longer than one exactness chunk (KCHUNK)."""
    old = mac_matmul.KCHUNK
    mac_matmul.KCHUNK = 16
    try:
        rng = np.random.default_rng(42)
        key = _rand_poly(ring, rng, 2, 40)
        x = _rand_poly(ring, rng, 40, 3)
        kp = mac_matmul.fold_key(ring, key, np)
        got = mac_matmul.mod_mac(ring, kp, x, np)
        np.testing.assert_array_equal(got, _scan_reference(ring, key, x))
    finally:
        mac_matmul.KCHUNK = old


def test_mod_mac_extreme_residues(ring):
    """All-max residues (q-1): the exactness bounds at their edge."""
    L, d = ring.L, ring.d
    J, K, n = 2, 9, 2
    qs = np.array(ring.primes, dtype=np.uint64)
    key = ring.from_u64(np.broadcast_to(
        (qs - 1)[:, None, None, None], (L, J, K, d)).copy())
    x = ring.from_u64(np.broadcast_to(
        (qs - 1)[:, None, None, None], (L, K, n, d)).copy())
    kp = mac_matmul.fold_key(ring, key, np)
    got = mac_matmul.mod_mac(ring, kp, x, np)
    np.testing.assert_array_equal(got, _scan_reference(ring, key, x))


def test_mod_mac_jax_int8_matches_scan(ring):
    """The jax path (one int8 dot_general + integer recombine) must equal
    the scan reference bit-for-bit."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for J, K, n in [(3, 7, 2), (2, 40, 3), (1, 5, 4)]:
        key = _rand_poly(ring, rng, J, K)
        x = _rand_poly(ring, rng, K, n)
        kp = mac_matmul.fold_key(ring, jnp.asarray(key), jnp)
        got = np.asarray(mac_matmul.mod_mac(ring, kp, jnp.asarray(x), jnp))
        np.testing.assert_array_equal(got, _scan_reference(ring, key, x))


def test_mod_mac_jax_extreme_residues(ring):
    import jax.numpy as jnp

    L, d = ring.L, ring.d
    J, K, n = 2, 9, 2
    qs = np.array(ring.primes, dtype=np.uint64)
    key = ring.from_u64(np.broadcast_to(
        (qs - 1)[:, None, None, None], (L, J, K, d)).copy())
    x = ring.from_u64(np.broadcast_to(
        (qs - 1)[:, None, None, None], (L, K, n, d)).copy())
    kp = mac_matmul.fold_key(ring, jnp.asarray(key), jnp)
    got = np.asarray(mac_matmul.mod_mac(ring, kp, jnp.asarray(x), jnp))
    np.testing.assert_array_equal(got, _scan_reference(ring, key, x))


def test_fold_key_plain_domain(ring):
    """montgomery=False: plain-integer key contraction (for host-computed
    challenge vectors that are not in Montgomery form)."""
    rng = np.random.default_rng(3)
    key = _rand_poly(ring, rng, 1, 6)
    x = _rand_poly(ring, rng, 6, 2)
    kp = mac_matmul.fold_key(ring, key, np, montgomery=False)
    got = mac_matmul.mod_mac(ring, kp, x, np)
    # reference: mform the key first, then mul_mont == plain product
    want = _scan_reference(ring, ring.mform(key), x)
    np.testing.assert_array_equal(got, want)
