"""Buckler end-to-end: the reference's RLWE public-key circuit
(buckler/buckler_test.go:17-99) at N=2^10 over zp220 — two NTT linear
constraints, one arithmetic constraint, two ternary inf-norm constraints."""

import random

import numpy as np
import pytest

from ringo_tpu import buckler
from ringo_tpu.fields import ZP220
from ringo_tpu.rings.bigring import CyclotomicRing

CRS = b"Buckler!"
N = 1 << 10


class PublicKeyCircuit:
    def __init__(self):
        self.ntt = None
        self.sk = buckler.Witness()
        self.sk_ntt = buckler.Witness()
        self.pk_ntt = [buckler.PublicWitness(), buckler.PublicWitness()]
        self.noise = buckler.Witness()
        self.noise_ntt = buckler.Witness()

    def define(self, ctx):
        ctx.add_linear_constraint(self.sk_ntt, self.sk, self.ntt)
        ctx.add_linear_constraint(self.noise_ntt, self.noise, self.ntt)

        # pk[1] - pk[0] * sk - noise = 0
        c = buckler.ArithmeticConstraint()
        c.add_term(1, self.pk_ntt[1])
        c.add_term(-1, self.pk_ntt[0], self.sk_ntt)
        c.add_term(-1, None, self.noise_ntt)
        ctx.add_arithmetic_constraint(c)

        ctx.add_inf_norm_constraint(self.sk, 1)
        ctx.add_inf_norm_constraint(self.noise, 1)


class _Assignment:
    """Same structure as PublicKeyCircuit but with values."""

    def __init__(self, sk, sk_ntt, pk0, pk1, noise, noise_ntt):
        self.ntt = None
        self.sk = sk
        self.sk_ntt = sk_ntt
        self.pk_ntt = [pk0, pk1]
        self.noise = noise
        self.noise_ntt = noise_ntt


def new_pk_instance(spec, rank, rng):
    ring = CyclotomicRing(spec, rank)
    sk = ring.from_ints([rng.randrange(3) - 1 for _ in range(rank)])
    noise = ring.from_ints([rng.randrange(3) - 1 for _ in range(rank)])
    sk_ntt = ring.ntt(sk)
    noise_ntt = ring.ntt(noise)
    pk0 = ring.from_ints([rng.randrange(spec.p) for _ in range(rank)], is_ntt=True)
    pk1 = ring.add(ring.mul(pk0, sk_ntt), noise_ntt)
    return _Assignment(sk.coeffs, sk_ntt.coeffs, pk0.coeffs, pk1.coeffs,
                       noise.coeffs, noise_ntt.coeffs)


@pytest.fixture(scope="module")
def compiled():
    c = PublicKeyCircuit()
    c.ntt = buckler.NTTChecker(ZP220, N)
    return buckler.compile_circuit(ZP220, N, c, CRS, seed=b"bk-test")


def test_public_key(compiled):
    prv, vrf = compiled
    rng = random.Random(77)
    pk = new_pk_instance(ZP220, N, rng)
    pf = prv.prove(pk)
    assert vrf.verify(pk, pf)


def test_public_key_rejects_bad_assignment(compiled):
    prv, vrf = compiled
    rng = random.Random(78)
    pk = new_pk_instance(ZP220, N, rng)
    pf = prv.prove(pk)
    # verifying against a different public key must fail
    other = new_pk_instance(ZP220, N, rng)
    assert not vrf.verify(other, pf)


def test_public_key_rejects_tampered_eval(compiled):
    prv, vrf = compiled
    rng = random.Random(79)
    pk = new_pk_instance(ZP220, N, rng)
    pf = prv.prove(pk)
    pf.evals[0] = (pf.evals[0] + 1) % ZP220.p
    assert not vrf.verify(pk, pf)


def test_prove_deterministic(compiled):
    """Two fresh provers compiled with the same seed produce byte-identical
    proofs (the compile seed threads into the Buckler prover's blind/mask
    stream — regression for the unseeded-stream bug found in round 3)."""
    rng = random.Random(80)
    pk = new_pk_instance(ZP220, N, rng)
    c1 = PublicKeyCircuit()
    c1.ntt = buckler.NTTChecker(ZP220, N)
    prv1, _ = buckler.compile_circuit(ZP220, N, c1, CRS, seed=b"det")
    c2 = PublicKeyCircuit()
    c2.ntt = buckler.NTTChecker(ZP220, N)
    prv2, _ = buckler.compile_circuit(ZP220, N, c2, CRS, seed=b"det")
    pf1 = prv1.prove(pk)
    pf2 = prv2.prove(pk)
    assert pf1.to_bytes(prv1.params) == pf2.to_bytes(prv2.params)
