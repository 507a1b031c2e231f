"""The MXU matmul NTT must be bit-identical to the stage-vectorized NTT
composed with mform/imform — any deviation breaks the exact CRT cutoff."""

import numpy as np
import pytest

import jax

from ringo_tpu.rings.rns import RnsRing, ntt_friendly_primes


@pytest.fixture(scope="module", params=[(256, 30, 3), (256, 28, 2)])
def ring(request):
    d, bits, L = request.param
    return RnsRing(d, ntt_friendly_primes(bits, 2 * d, L))


def _rand_poly(ring, batch, seed):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, min(ring.primes), (ring.L, *batch, ring.d),
                     dtype=np.uint64)
    # per-prime ranges differ; clamp per plane
    for l, q in enumerate(ring.primes):
        v[l] %= np.uint64(q)
    return ring.from_u64(v)

def test_ntt_mform_matches_stage(ring):
    x = _rand_poly(ring, (3,), 1)
    want = ring.ntt(ring.mform(x))
    got = jax.jit(ring.ntt_mform)(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_intt_imform_matches_stage(ring):
    x = _rand_poly(ring, (2, 3), 2)
    want = ring.intt(ring.imform(x))
    got = jax.jit(ring.intt_imform)(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_round_trip(ring):
    x = _rand_poly(ring, (4,), 3)
    fwd = jax.jit(ring.ntt_mform)(x)
    back = jax.jit(ring.intt_imform)(np.asarray(fwd))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
