"""Wire-format round trips: a deserialized proof must verify (the reference
keeps proofs in memory; this format reuses its element/poly byte layouts)."""

import random

import numpy as np

from ringo_tpu import buckler, jindo
from ringo_tpu.fields import ZP128, ZP255, limb
from ringo_tpu.rings.bigring import CyclotomicRing

from test_buckler import PublicKeyCircuit, _Assignment


def test_jindo_proof_roundtrip():
    spec = ZP255
    n = 1 << 9
    rng = random.Random(4)
    params = jindo.new_parameters(spec, n, 1)
    prv = jindo.Prover(params, b"Jindo!", seed=b"ser")
    vrf = jindo.Verifier(params, b"Jindo!")
    v = limb.ints_to_digits([rng.randrange(spec.p) for _ in range(n)], spec.w)
    com, op = prv.commit(v)
    x = rng.randrange(spec.p)
    ys, pf = prv.evaluate(x, [v], [com], [op])

    com2 = jindo.Commitment.from_bytes(params, com.to_bytes())
    pf2 = jindo.Proof.from_bytes(params, pf.to_bytes(params))
    assert vrf.verify(x, [com2], ys, pf2)

    blob = bytearray(pf.to_bytes(params))
    blob[8] ^= 1  # low byte of a residue word
    pf3 = jindo.Proof.from_bytes(params, bytes(blob))
    assert not vrf.verify(x, [com2], ys, pf3)


def test_buckler_proof_roundtrip():
    spec = ZP128
    n = 1 << 8
    rng = random.Random(5)
    ring = CyclotomicRing(spec, n)
    sk = ring.from_ints([rng.randrange(3) - 1 for _ in range(n)])
    noise = ring.from_ints([rng.randrange(3) - 1 for _ in range(n)])
    sk_ntt = ring.ntt(sk)
    noise_ntt = ring.ntt(noise)
    pk0 = ring.from_ints([rng.randrange(spec.p) for _ in range(n)],
                         is_ntt=True)
    pk1 = ring.add(ring.mul(pk0, sk_ntt), noise_ntt)

    c = PublicKeyCircuit()
    c.ntt = buckler.NTTChecker(spec, n)
    prover, verifier = buckler.compile_circuit(spec, n, c, b"ser", seed=b"s")
    a = _Assignment(sk.coeffs, sk_ntt.coeffs, pk0.coeffs, pk1.coeffs,
                    noise.coeffs, noise_ntt.coeffs)
    proof = prover.prove(a)

    blob = proof.to_bytes(prover.params)
    proof2 = buckler.Proof.from_bytes(prover.params, blob)
    pub = _Assignment(None, None, pk0.coeffs, pk1.coeffs, None, None)
    assert verifier.verify(pub, proof2)
