"""Prove X * Y = Z over R_p = Z_p[X]/(X^rank + 1) with |X|_inf <= 5.

Port of the reference example (examples/mult/main.go): the ring relation is
flattened to NTT-domain linear + pointwise arithmetic constraints:

    XNTT = NTT(X); ZNTT = NTT(Z); XNTT * YNTT - ZNTT = 0; |X| <= 5
"""

import argparse
import random
import time

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ringo_tpu import buckler
from ringo_tpu.fields import ZP128
from ringo_tpu.rings.bigring import CyclotomicRing


class MultCircuit:
    def __init__(self):
        self.ntt_checker = None
        self.y_ntt = buckler.PublicWitness()
        self.x_coeffs = buckler.Witness()
        self.z_coeffs = buckler.Witness()
        self.x_ntt = buckler.Witness()
        self.z_ntt = buckler.Witness()

    def define(self, ctx):
        ctx.add_linear_constraint(self.x_ntt, self.x_coeffs, self.ntt_checker)
        ctx.add_linear_constraint(self.z_ntt, self.z_coeffs, self.ntt_checker)

        mult = buckler.ArithmeticConstraint()
        mult.add_term(1, self.y_ntt, self.x_ntt)   # YNTT * XNTT
        mult.add_term(-1, None, self.z_ntt)        # - ZNTT
        ctx.add_arithmetic_constraint(mult)

        ctx.add_inf_norm_constraint(self.x_coeffs, 5)


class MultAssignment:
    def __init__(self, y_ntt, x, z, x_ntt, z_ntt):
        self.ntt_checker = None
        self.y_ntt = y_ntt
        self.x_coeffs = x
        self.z_coeffs = z
        self.x_ntt = x_ntt
        self.z_ntt = z_ntt


def main(log_rank: int = 13):
    spec = ZP128
    rank = 1 << log_rank
    rng = random.Random()

    ring = CyclotomicRing(spec, rank)
    x = ring.from_ints([rng.randrange(6) for _ in range(rank)])
    y = ring.from_ints([rng.randrange(spec.p) for _ in range(rank)])
    x_ntt = ring.ntt(x)
    y_ntt = ring.ntt(y)
    z_ntt = ring.mul(x_ntt, y_ntt)
    z = ring.intt(z_ntt)

    crs = rng.randbytes(16)
    c = MultCircuit()
    c.ntt_checker = buckler.NTTChecker(spec, rank)
    t0 = time.time()
    prover, verifier = buckler.compile_circuit(spec, rank, c, crs)
    print(f"Compile time: {time.time() - t0:.3f}s")

    assignment = MultAssignment(y_ntt.coeffs, x.coeffs, z.coeffs,
                                x_ntt.coeffs, z_ntt.coeffs)
    t0 = time.time()
    proof = prover.prove(assignment)
    print(f"Prover time: {time.time() - t0:.3f}s")

    # the verifier only reads PublicWitness positions
    public = MultAssignment(y_ntt.coeffs, None, None, None, None)

    t0 = time.time()
    ok = verifier.verify(public, proof)
    print(f"Verifier time: {time.time() - t0:.3f}s")
    print("Verification result:", ok)
    print(f"Estimated proof size: {prover.params.size() / 2**23:.3f} MB")
    assert ok


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-rank", type=int, default=13)
    ap.add_argument("--jax", action="store_true",
                    help="run on the jax backend (TPU when available)")
    args = ap.parse_args()
    if args.jax:
        from ringo_tpu import backend
        backend.use("jax")
    main(args.log_rank)
