"""Circuit compilation (reference buckler/compile.go): walk the circuit to
assign witness IDs, run define(), derive Jindo parameters from the circuit's
commitment count and max committed degree, and build the prover/verifier."""

from __future__ import annotations

from .. import jindo
from ..fields.spec import FieldSpec
from ..rings.bigring import CyclicRing
from .context import Context
from .encoder import Encoder
from .prover import Prover
from .verifier import Verifier
from .witness import PublicWitness, Witness, walk_markers


def compile_circuit(spec: FieldSpec, witness_rank: int, circuit, crs: bytes,
                    limb_bits: int | None = None, seed: bytes | None = None,
                    strict: bool = False):
    """Returns (prover, verifier).  Reference Compile (compile.go:164-207).
    ``strict`` hardens two documented reference quirks (see Context)."""
    pw_paths, w_paths = [], []
    for path, marker in walk_markers(circuit):
        if isinstance(marker, PublicWitness):
            marker.id = len(pw_paths)
            pw_paths.append(path)
        elif isinstance(marker, Witness):
            marker.id = len(w_paths)
            w_paths.append(path)

    ctx = Context(spec, witness_rank, len(pw_paths), len(w_paths),
                  strict=strict)
    circuit.define(ctx)

    kwargs = {} if limb_bits is None else {"limb_bits": limb_bits}
    params = jindo.new_parameters(spec, ctx.commit_rank(), ctx.batch(), **kwargs)

    # embedding rank: next power of two >= max constraint degree
    max_rank = max(ctx.arith_check_max_rank, ctx.sum_check_max_rank)
    emb_rank = 1 << (max_rank - 1).bit_length()

    poly_ring = CyclicRing(spec, emb_rank)
    ecd = Encoder(spec, witness_rank, emb_rank)

    prv = Prover(params, poly_ring, ecd, ctx,
                 jindo.Prover(params, crs, seed=seed),
                 pw_paths, w_paths, seed=seed)
    vrf = Verifier(params, poly_ring, ecd, ctx,
                   jindo.Verifier(params, crs),
                   pw_paths, w_paths)
    return prv, vrf
