"""Buckler on the jax backend (plain representation, device ring ops):
the same RLWE public-key circuit as test_buckler, proved under
backend.use("jax") on the CPU test mesh — exercises the BigMul/BigNTT plain
path end to end, cross-checked by the verifier (which replays the identical
plain-mode pipeline)."""

import random

import numpy as np
import pytest

from ringo_tpu import backend, buckler
from ringo_tpu.fields import ZP128
from ringo_tpu.rings.bigring import CyclotomicRing

from test_buckler import PublicKeyCircuit, _Assignment

CRS = b"Buckler!"
N = 1 << 8


@pytest.fixture(scope="module", autouse=True)
def jax_backend():
    backend.use("jax")
    yield
    backend.use("numpy")


def test_public_key_device_roundtrip():
    spec = ZP128
    rng = random.Random(77)
    ring = CyclotomicRing(spec, N)
    assert ring.plain

    sk = ring.from_ints([rng.randrange(3) - 1 for _ in range(N)])
    noise = ring.from_ints([rng.randrange(3) - 1 for _ in range(N)])
    sk_ntt = ring.ntt(sk)
    noise_ntt = ring.ntt(noise)
    pk0 = ring.from_ints([rng.randrange(spec.p) for _ in range(N)],
                         is_ntt=True)
    pk1 = ring.add(ring.mul(pk0, sk_ntt), noise_ntt)

    c = PublicKeyCircuit()
    c.ntt = buckler.NTTChecker(spec, N)
    prover, verifier = buckler.compile_circuit(spec, N, c, CRS, seed=b"dev")

    a = _Assignment(sk.coeffs, sk_ntt.coeffs, pk0.coeffs, pk1.coeffs,
                    noise.coeffs, noise_ntt.coeffs)
    proof = prover.prove(a)

    pub = _Assignment(None, None, pk0.coeffs, pk1.coeffs, None, None)
    assert verifier.verify(pub, proof)

    # soundness: tampered evaluation fails
    proof.evals[0] = (proof.evals[0] + 1) % spec.p
    assert not verifier.verify(pub, proof)


def test_plain_ring_matches_mont_ring():
    """Same polynomial algebra in both representations."""
    spec = ZP128
    rng = random.Random(3)
    vals_a = [rng.randrange(spec.p) for _ in range(N)]
    vals_b = [rng.randrange(spec.p) for _ in range(N)]
    rp = CyclotomicRing(spec, N, plain=True)
    rm = CyclotomicRing(spec, N, plain=False)
    pa, pb = rp.from_ints(vals_a), rp.from_ints(vals_b)
    ma, mb = rm.from_ints(vals_a), rm.from_ints(vals_b)
    got = rp.to_ints(rp.intt(rp.mul(rp.ntt(pa), rp.ntt(pb))))
    want = rm.to_ints(rm.intt(rm.mul(rm.ntt(ma), rm.ntt(mb))))
    assert got == want


def test_cross_backend_verifiability():
    """Proofs interoperate across backends: a proof produced by the numpy
    (Montgomery host) prover verifies under the jax (plain device,
    wide-field matmul NTT) verifier and vice versa.  Proof BYTES differ by
    design — the jax prover samples its blinds from the device ChaCha20
    twin-CDT stream, numpy from the host sampler — but the verifier's
    replay is sampling-free, so verdicts must agree."""
    import random

    from ringo_tpu import buckler
    from ringo_tpu.fields import ZP220

    from test_buckler import PublicKeyCircuit, _Assignment

    spec, n = ZP220, 1 << 8
    rng = random.Random(41)
    sk_i = [rng.randrange(3) - 1 for _ in range(n)]
    nz_i = [rng.randrange(3) - 1 for _ in range(n)]
    pk0_i = [rng.randrange(spec.p) for _ in range(n)]

    def build(backend_name):
        backend.use(backend_name)
        ring = CyclotomicRing(spec, n)
        sk = ring.from_ints(sk_i)
        nz = ring.from_ints(nz_i)
        sk_ntt, nz_ntt = ring.ntt(sk), ring.ntt(nz)
        pk0 = ring.from_ints(pk0_i, is_ntt=True)
        pk1 = ring.add(ring.mul(pk0, sk_ntt), nz_ntt)
        a = _Assignment(sk.coeffs, sk_ntt.coeffs, pk0.coeffs, pk1.coeffs,
                        nz.coeffs, nz_ntt.coeffs)
        pub = _Assignment(None, None, pk0.coeffs, pk1.coeffs, None, None)
        c = PublicKeyCircuit()
        c.ntt = buckler.NTTChecker(spec, n)
        prv, vrf = buckler.compile_circuit(spec, n, c, b"xbackend",
                                           seed=b"xbackend")
        return prv, vrf, a, pub

    try:
        prv_np, vrf_np, a_np, pub_np = build("numpy")
        wire_np = prv_np.prove(a_np).to_bytes(prv_np.params)

        prv_j, vrf_j, a_j, pub_j = build("jax")
        pf_j = prv_j.prove(a_j)
        wire_j = pf_j.to_bytes(prv_j.params)
        # numpy-produced proof verifies on the jax verifier...
        assert vrf_j.verify(
            pub_j, buckler.Proof.from_bytes(prv_j.params, wire_np))
        # ...and a tampered one still fails
        bad = buckler.Proof.from_bytes(prv_j.params, wire_np)
        bad.evals[0] = (bad.evals[0] + 1) % spec.p
        assert not vrf_j.verify(pub_j, bad)

        # jax-produced proof verifies on the numpy verifier
        backend.use("numpy")
        assert vrf_np.verify(
            pub_np, buckler.Proof.from_bytes(prv_np.params, wire_j))
    finally:
        backend.use("numpy")
