"""RNS ring tests vs exact Python-int semantics (reference: lattigo ring usage
per SURVEY.md §2.2; jindo/rns.go)."""

import random

import numpy as np
import pytest

from ringo_tpu.rings.rns import (
    BasisExtender, RnsReconstructor, RnsRing, ntt_friendly_primes,
)

D = 64


@pytest.fixture(scope="module")
def ring():
    primes = ntt_friendly_primes(30, 2 * D, 3)
    return RnsRing(D, primes)


def rand_poly_u64(ring, rng):
    res = np.zeros((ring.L, D), dtype=np.uint64)
    for l, p in enumerate(ring.primes):
        res[l] = np.array([rng.randrange(p) for _ in range(D)], dtype=np.uint64)
    return res


def test_prime_gen():
    primes = ntt_friendly_primes(30, 2 * D, 4)
    assert len(set(primes)) == 4
    for p in primes:
        assert p % (2 * D) == 1 and p.bit_length() in (30, 31)


def test_add_sub_neg_mul(ring):
    rng = random.Random(20)
    a64, b64 = rand_poly_u64(ring, rng), rand_poly_u64(ring, rng)
    a, b = ring.from_u64(a64), ring.from_u64(b64)
    qs = np.array(ring.primes, dtype=np.uint64).reshape(-1, 1)
    assert (ring.to_u64(ring.add(a, b)) == (a64 + b64) % qs).all()
    sub_want = (a64.astype(np.int64) - b64.astype(np.int64)) % qs.astype(np.int64)
    assert (ring.to_u64(ring.sub(a, b)).astype(np.int64) == sub_want).all()
    assert (ring.to_u64(ring.neg(a)) == (qs - a64) % qs).all()
    # Montgomery roundtrip + product
    am = ring.mform(a)
    assert (ring.to_u64(ring.imform(am)) == a64).all()
    prod = ring.to_u64(ring.mul_mont(am, b))
    want = (a64.astype(object) * b64.astype(object)) % qs.astype(object)
    assert (prod.astype(object) == want).all()


def test_ntt_negacyclic_convolution(ring):
    rng = random.Random(21)
    a64, b64 = rand_poly_u64(ring, rng), rand_poly_u64(ring, rng)
    a, b = ring.from_u64(a64), ring.from_u64(b64)
    fa, fb = ring.ntt(ring.mform(a)), ring.ntt(b)
    prod = ring.to_u64(ring.intt(ring.mul_mont(fa, fb)))
    for l, p in enumerate(ring.primes):
        want = [0] * D
        for i in range(D):
            for j in range(D):
                s = 1 if i + j < D else -1
                want[(i + j) % D] = (want[(i + j) % D]
                                     + s * int(a64[l, i]) * int(b64[l, j])) % p
        assert list(prod[l].astype(object)) == want


def test_reconstruct_roundtrip(ring):
    rng = random.Random(22)
    rec = RnsReconstructor(ring)
    Q = ring.modulus
    vals = [rng.randrange(-(Q // 2) + 1, Q // 2) for _ in range(D - 3)]
    vals += [0, 5, -7]  # small fast path
    poly = rec.set_bigints([v % Q for v in vals])
    back = rec.reconstruct(poly)
    assert back == vals


def test_scalar_ops(ring):
    rng = random.Random(23)
    a64 = rand_poly_u64(ring, rng)
    a = ring.from_u64(a64)
    s = 123456789
    sm = ring.scalar_rns_mont(s)
    out = ring.to_u64(ring.mul_scalar_mont(a, sm))
    qs = np.array(ring.primes, dtype=np.uint64).reshape(-1, 1)
    want = (a64.astype(object) * s) % qs.astype(object)
    assert (out.astype(object) == want).all()


def test_basis_extension(ring):
    rng = random.Random(24)
    primes2 = ntt_friendly_primes(29, 2 * D, 4)
    ring2 = RnsRing(D, primes2)
    ext = BasisExtender(ring, ring2)
    vals = [rng.randrange(-1000, 1000) for _ in range(D)]
    rec = RnsReconstructor(ring)
    poly = rec.set_bigints([v % ring.modulus for v in vals])
    lifted = ext.lift(poly)
    rec2 = RnsReconstructor(ring2)
    assert rec2.reconstruct(lifted) == vals


def test_embed_int64(ring):
    vals = np.array([[-5, 0, 3, -1] + [0] * (D - 4)], dtype=np.int64)
    poly = ring.embed_int64(vals)
    u = ring.to_u64(poly)
    for l, p in enumerate(ring.primes):
        assert u[l, 0, 0] == p - 5 and u[l, 0, 2] == 3


def test_jax_ring_matches_numpy(ring):
    import jax
    import jax.numpy as jnp

    rng = random.Random(25)
    a = ring.from_u64(rand_poly_u64(ring, rng))
    b = ring.from_u64(rand_poly_u64(ring, rng))
    f = lambda x, y: ring.intt(ring.mul_mont(ring.ntt(ring.mform(x)), ring.ntt(y)))
    out_np = np.asarray(f(a, b))
    out_j = np.asarray(jax.jit(f)(jnp.asarray(a), jnp.asarray(b)))
    assert (out_np == out_j).all()
