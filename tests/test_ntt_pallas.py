"""Bit-equality of the fused Pallas matmul-NTT (ops/ntt_pallas.py) with
the XLA matmul-NTT path (ops/ntt_matmul.py) — interpret mode on CPU."""

import numpy as np
import pytest

from ringo_tpu.rings.rns import RnsRing, ntt_friendly_primes

D = 256


@pytest.fixture(scope="module")
def ring():
    return RnsRing(D, ntt_friendly_primes(30, 2 * D, 3))


def _rand_poly(ring, n, seed):
    rng = np.random.default_rng(seed)
    res = rng.integers(
        0, np.array(ring.primes, dtype=np.uint64).reshape(-1, 1, 1),
        size=(ring.L, n, D), dtype=np.uint64)
    return ring.from_u64(res)


@pytest.mark.parametrize("fn", ["ntt_mform", "intt_imform"])
def test_bit_identical_to_xla_path(ring, fn):
    import jax.numpy as jnp

    from ringo_tpu.ops.ntt_pallas import TILE, PallasNTT

    mm = ring._matmul_ntt()
    pk = PallasNTT(mm)
    n = TILE + 17  # exercises padding
    x = _rand_poly(ring, n, 7)
    want = np.asarray(getattr(mm, fn)(jnp.asarray(x)))
    got = np.asarray(getattr(pk, fn)(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, want)
