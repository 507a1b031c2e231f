"""Whole-pipeline sharding: attach a device mesh to the jindo prover, the
jindo verifier, and a Buckler prover so that every device program they
dispatch carries dp/tp/sp sharding constraints (GSPMD inserts the ICI
collectives).  The reference is a single-node CPU library (SURVEY.md §2.9);
this scale-out layer is new design, not a port.

Axis mapping (same as parallel/commit.py):

* ``dp`` — commit batch / witness batch
* ``tp`` — RNS prime planes (cross-plane CRT sums become all-reduces)
* ``sp`` — MSIS/decomposition rank, and the coefficient grid of the
  four-step embedding NTT (parallel/bigntt.py — all-to-all transposes)

Everything stays bit-identical to the single-device programs: the lattice
arithmetic is exact integer math, and the only transform whose internal
ordering changes (the Buckler embedding-ring NTT pair) is self-inverse, so
proofs and verdicts match byte-for-byte (tests/test_parallel.py).
"""

from __future__ import annotations

from jax.sharding import Mesh


def shard_jindo_prover(prover, mesh: Mesh):
    """Commit/evaluate device programs run sharded: batched fused commit
    over dp x tp x sp, partial/response/combine stages over tp.  Call
    before the first commit (jitted stages are rebuilt)."""
    prover.set_mesh(mesh)
    return prover


def shard_jindo_verifier(verifier, mesh: Mesh):
    """The verifier's one-program modmul core runs sharded (tp x sp)."""
    verifier.set_mesh(mesh)
    return verifier


def shard_buckler_prover(bk_prover, mesh: Mesh, ntt_n1: int | None = None,
                         min_ntt_rank: int = 1 << 12):
    """Full Buckler prove over the mesh: the jindo commitment/evaluation
    stages get dp/tp/sp constraints, and — when the embedding rank is at
    least ``min_ntt_rank`` — the embedding-ring NTT pair is swapped for
    the coefficient-sharded four-step engine (all-to-all over ``sp``),
    covering the quotient rounds' widest tensors.  Below the threshold the
    all-to-all overhead outweighs the split and the NTTs stay local."""
    shard_jindo_prover(bk_prover.jindo, mesh)
    if bk_prover.poly_ring.rank >= min_ntt_rank:
        bk_prover.poly_ring.shard(mesh, n1=ntt_n1)
    return bk_prover
