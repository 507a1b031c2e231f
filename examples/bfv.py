"""Prove well-formedness of a BFV ciphertext: c0 = -c1*s + Delta*m + e with
|m| < t and |e| <= B_e.

Port of the reference example (examples/bfv/main.go), with the lattigo
bgv/rlwe layer replaced by the built-in minimal BGV scheme over RnsRing
(ringo_tpu.schemes.bgv).  As in the reference, the ciphertext lives in an RNS
modulus q while Buckler proves over a single large prime p, so the ciphertext
is modulus-switched q -> p first; the switched error |e'| ~ t + N.
"""

import argparse
import random
import time

import numpy as np

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ringo_tpu import buckler
from ringo_tpu.fields import ZP240
from ringo_tpu.rings.bigring import CyclotomicRing
from ringo_tpu.rings.rns import RnsReconstructor
from ringo_tpu.schemes.bgv import BGV, BGVParams


class CiphertextCircuit:
    def __init__(self, plaintext_modulus: int, err_bound: int, delta: int):
        self.ntt_checker = None
        self.plaintext_modulus = plaintext_modulus
        self.err_bound = err_bound
        self.delta = delta

        self.ciphertext_ntt = [buckler.PublicWitness(), buckler.PublicWitness()]
        self.secret_key_ntt = buckler.Witness()
        self.message_ntt = buckler.Witness()
        self.message_coeffs = buckler.Witness()
        self.error_ntt = buckler.Witness()
        self.error_coeffs = buckler.Witness()

    def define(self, ctx):
        ctx.add_linear_constraint(self.message_ntt, self.message_coeffs,
                                  self.ntt_checker)
        ctx.add_linear_constraint(self.error_ntt, self.error_coeffs,
                                  self.ntt_checker)

        # c0 + c1 * sk - Delta * m - e = 0
        c = buckler.ArithmeticConstraint()
        c.add_term(1, self.ciphertext_ntt[0])
        c.add_term(1, self.ciphertext_ntt[1], self.secret_key_ntt)
        c.add_term(-self.delta, None, self.message_ntt)
        c.add_term(-1, None, self.error_ntt)
        ctx.add_arithmetic_constraint(c)

        ctx.add_inf_norm_constraint(self.message_coeffs,
                                    self.plaintext_modulus - 1)
        ctx.add_inf_norm_constraint(self.error_coeffs, self.err_bound)


class CiphertextAssignment:
    def __init__(self, circuit: CiphertextCircuit, ct_ntt=(None, None),
                 sk_ntt=None, m_ntt=None, m=None, e_ntt=None, e=None):
        self.ntt_checker = None
        self.plaintext_modulus = circuit.plaintext_modulus
        self.err_bound = circuit.err_bound
        self.delta = circuit.delta
        self.ciphertext_ntt = list(ct_ntt)
        self.secret_key_ntt = sk_ntt
        self.message_ntt = m_ntt
        self.message_coeffs = m
        self.error_ntt = e_ntt
        self.error_coeffs = e


def main(log_n: int = 13):
    spec = ZP240
    t = (1 << 16) + 1
    rng = random.Random()

    # --- BFV encryption over RNS q (reference main.go:89-125) -------------
    bgv_params = BGVParams(log_n, [60, 60, 60, 60], t)
    bgv = BGV(bgv_params, seed=rng.randbytes(16))
    sk = bgv.gen_secret_key()
    n = bgv_params.n
    m = np.zeros(n, dtype=np.int64)
    m[:4] = [1, 2, 3, 4]
    c0, c1, _ = bgv.encrypt(sk, m)
    assert (bgv.decrypt(sk, c0, c1)[:4] == m[:4]).all()

    # --- modulus switch q -> p (reference main.go:127-174) ----------------
    ring = CyclotomicRing(spec, n)
    rec = RnsReconstructor(bgv_params.ring_q)
    q = bgv_params.q

    sk_big = ring.from_ints([v % spec.p for v in sk.coeffs.tolist()])
    sk_ntt = ring.ntt(sk_big)

    # message centered mod t
    m_centered = [int(v) if v <= t // 2 else int(v) - t for v in m.tolist()]
    m_big = ring.from_ints([v % spec.p for v in m_centered])
    m_ntt = ring.ntt(m_big)

    ct_big = []
    for c in (c0, c1):
        vals = rec.reconstruct(c)  # balanced mod q
        ct_big.append(ring.mod_switch_ints([v % q for v in vals], q))
    ct_ntt = [ring.ntt(cb) for cb in ct_big]

    # circuit Delta = floor(t^{-1} mod q * p / q)  (reference main.go:161-164)
    delta = pow(t, -1, q) * spec.p // q

    # recompute the post-switch error e = c0 + c1*s - Delta*m
    err_ntt = ring.mul(ct_ntt[1], sk_ntt)
    err_ntt = ring.add(err_ntt, ct_ntt[0])
    err_ntt = ring.sub(err_ntt, ring.scalar_mul(m_ntt, delta))
    err = ring.intt(err_ntt)
    err_bound = n + t

    # --- prove + verify ----------------------------------------------------
    crs = rng.randbytes(16)
    circuit = CiphertextCircuit(t, err_bound, delta)
    circuit.ntt_checker = buckler.NTTChecker(spec, n)

    t0 = time.time()
    prover, verifier = buckler.compile_circuit(spec, n, circuit, crs)
    print(f"Compile time: {time.time() - t0:.3f}s")

    assignment = CiphertextAssignment(
        circuit,
        ct_ntt=(ct_ntt[0].coeffs, ct_ntt[1].coeffs),
        sk_ntt=sk_ntt.coeffs,
        m_ntt=m_ntt.coeffs, m=m_big.coeffs,
        e_ntt=err_ntt.coeffs, e=err.coeffs,
    )

    t0 = time.time()
    pf = prover.prove(assignment)
    print(f"Prover time: {time.time() - t0:.3f}s")

    public = CiphertextAssignment(
        circuit, ct_ntt=(ct_ntt[0].coeffs, ct_ntt[1].coeffs))
    t0 = time.time()
    ok = verifier.verify(public, pf)
    print(f"Verifier time: {time.time() - t0:.3f}s")
    print("Verification result:", ok)
    print(f"Estimated size: {prover.params.size() / 2**23:.3f} MB")
    assert ok


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=13)
    ap.add_argument("--jax", action="store_true",
                    help="run on the jax backend (TPU when available)")
    args = ap.parse_args()
    if args.jax:
        from ringo_tpu import backend
        backend.use("jax")
    main(args.log_n)
