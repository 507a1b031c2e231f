"""Golden tests of the limb engine against Python int arithmetic.

Replaces the reference's gopter property tests of the generated zp packages
(jindo/internal/zp/element_test.go): every kernel is checked for exact
agreement with big-int semantics on random and adversarial inputs, across all
seven reference moduli.
"""

import random

import numpy as np
import pytest

from ringo_tpu.fields import (
    FieldOps, FieldSpec, REFERENCE_FIELDS, derive_base_exp, find_modulus, limb,
)

SPECS = list(REFERENCE_FIELDS.items())


def rand_ints(spec, n, rng):
    vals = [rng.randrange(spec.p) for _ in range(n - 4)]
    # adversarial: 0, 1, p-1, p-2
    vals += [0, 1, spec.p - 1, spec.p - 2]
    return vals


@pytest.mark.parametrize("name,spec", SPECS)
def test_roundtrip(name, spec):
    rng = random.Random(1)
    ops = FieldOps(spec)
    vals = rand_ints(spec, 64, rng)
    assert ops.to_ints(ops.from_ints(vals)) == vals


@pytest.mark.parametrize("name,spec", SPECS)
def test_add_sub_neg_mul(name, spec):
    rng = random.Random(2)
    ops = FieldOps(spec)
    a = rand_ints(spec, 64, rng)
    b = list(reversed(rand_ints(spec, 64, rng)))
    da, db = ops.from_ints(a), ops.from_ints(b)
    p = spec.p
    assert ops.to_ints(ops.add(da, db)) == [(x + y) % p for x, y in zip(a, b)]
    assert ops.to_ints(ops.sub(da, db)) == [(x - y) % p for x, y in zip(a, b)]
    assert ops.to_ints(ops.neg(da)) == [(-x) % p for x in a]
    assert ops.to_ints(ops.mul(da, db)) == [(x * y) % p for x, y in zip(a, b)]


@pytest.mark.parametrize("name,spec", SPECS)
def test_mul_associativity_random(name, spec):
    rng = random.Random(3)
    ops = FieldOps(spec)
    a = rand_ints(spec, 32, rng)
    b = rand_ints(spec, 32, rng)
    c = rand_ints(spec, 32, rng)
    da, db, dc = ops.from_ints(a), ops.from_ints(b), ops.from_ints(c)
    lhs = ops.to_ints(ops.mul(ops.mul(da, db), dc))
    rhs = [(x * y % spec.p) * z % spec.p for x, y, z in zip(a, b, c)]
    assert lhs == rhs


@pytest.mark.parametrize("name,spec", SPECS[:3])
def test_jax_matches_numpy(name, spec):
    import jax
    import jax.numpy as jnp

    rng = random.Random(4)
    ops = FieldOps(spec)
    a = rand_ints(spec, 32, rng)
    b = rand_ints(spec, 32, rng)
    da, db = ops.from_ints(a), ops.from_ints(b)
    fn = jax.jit(lambda x, y: ops.mul(ops.add(x, y), ops.sub(x, y)))
    out_j = np.asarray(fn(jnp.asarray(da), jnp.asarray(db)))
    out_n = np.asarray(ops.mul(ops.add(da, db), ops.sub(da, db)))
    assert (out_j == out_n).all()


def test_divmod_small():
    spec = REFERENCE_FIELDS["zp255"]
    rng = random.Random(5)
    vals = [rng.randrange(spec.p) for _ in range(32)]
    d = limb.ints_to_digits(vals, spec.w)
    q, r = limb.divmod_small(d, spec.b)
    qs = limb.digits_to_ints(q)
    assert qs == [v // spec.b for v in vals]
    assert list(np.asarray(r)) == [v % spec.b for v in vals]


def test_derive_base_exp():
    for name, spec in SPECS:
        b, k = derive_base_exp(spec.p)
        assert (b, k) == (spec.b, spec.k), name


def test_find_modulus_reproduces_reference():
    # jindo-modulus -n 110 must find the zp110 modulus, etc.
    for bits, name in [(110, "zp110"), (128, "zp128")]:
        s = find_modulus(bits, bits + 1)
        assert s.p == REFERENCE_FIELDS[name].p


def test_marshal_roundtrip():
    spec = REFERENCE_FIELDS["zp220"]
    rng = random.Random(6)
    for _ in range(10):
        v = rng.randrange(spec.p)
        assert spec.unmarshal(spec.marshal(v)) == v
    assert len(spec.marshal(1)) == 8 * 4  # 220 bits -> 4 x 64-bit words
