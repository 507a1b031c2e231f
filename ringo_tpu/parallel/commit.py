"""Sharded batched Jindo commitment: the multi-chip "training step".

Wraps the prover's single-commit device program (jindo/prover.py
``commit_core``: encode NTTs -> inner Ajtai MACs -> exact CRT cutoff ->
outer MACs -> outer cutoff; reference jindo/prover.go:45-202) in
``vmap`` over a batch of commits and jits it over a device mesh with
GSPMD shardings:

* batch axis        -> ``dp``
* RNS prime planes  -> ``tp``  (cross-plane CRT sum becomes an all-reduce)
* MSIS/decomp rank  -> ``sp``  (column-parallel Ajtai outputs)

The sharded program is bit-identical to running ``commit_core`` per item
on one device (tests/test_parallel.py).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh, *spec):
    names = set(mesh.axis_names)
    spec = tuple(s if s in names else None for s in spec)
    return NamedSharding(mesh, P(*spec))


def build_sharded_commit(prover, mesh: Mesh):
    """Returns a jitted fn (e_i64 [t,B,R,d], noise_i64 [t,B,K,d]) ->
    (enc, mlwe, in_commit, outer), each with a leading batch axis, sharded
    over the mesh.  ``t`` need not divide the ``dp`` axis (GSPMD pads)."""
    raw = prover.raw_stages()["commit_core"]
    wsc = jax.lax.with_sharding_constraint

    def step(e_i64, noise_i64, pk_inml, pk_out):
        # commit-key MAC planes are traced arguments (replicated), NOT
        # trace-time constants: baking them into the HLO would force a
        # recompile for every CRS (same rule as stage_encode_mac)
        e_i64 = wsc(e_i64, _ns(mesh, "dp"))
        noise_i64 = wsc(noise_i64, _ns(mesh, "dp"))
        pk_inml = wsc(pk_inml, _ns(mesh))
        pk_out = wsc(pk_out, _ns(mesh))
        enc, mlwe, ic, outer = jax.vmap(
            raw, in_axes=(0, 0, None, None))(
                e_i64, noise_i64, pk_inml, pk_out)
        # enc/mlwe [t, 2, L, B, R|K, d]: planes on tp
        enc = wsc(enc, _ns(mesh, "dp", None, "tp"))
        mlwe = wsc(mlwe, _ns(mesh, "dp", None, "tp"))
        # in_commit [t, 2, LO, dcmp, d] / outer [t, 2, LO, outR, d]:
        # planes on tp, decomposition/MSIS rank on sp
        ic = wsc(ic, _ns(mesh, "dp", None, "tp", "sp"))
        outer = wsc(outer, _ns(mesh, "dp", None, "tp", "sp"))
        return enc, mlwe, ic, outer

    return jax.jit(step)


def commit_batch(prover, mesh: Mesh, e_i64: np.ndarray, noise_i64: np.ndarray):
    """Convenience: run the sharded step once on host-prepared encode
    coefficients and MLWE noise (both from the prover's host samplers)."""
    fn = build_sharded_commit(prover, mesh)
    return fn(e_i64, noise_i64, *prover.ck_device())


def build_sharded_evaluate(prover, mesh: Mesh):
    """Sharded batched evaluation stages: for a batch of openings (leading
    axis t on ``dp``), compute the partial products and challenge responses
    (jindo/prover.go:275-316) with RNS planes on ``tp``.  Returns a jitted
    fn (left_ecd [2,L,rows,d], enc [t,2,L,B,R,d], mlwe [t,2,L,B,K,d],
    chals [2,L,cols,d]) -> (partials [t,...], resp_e [t,...], resp_m [t,...])."""
    raws = prover.raw_stages()
    wsc = jax.lax.with_sharding_constraint

    def step(left_ecd, enc, mlwe, chals):
        enc = wsc(enc, _ns(mesh, "dp", None, "tp"))
        mlwe = wsc(mlwe, _ns(mesh, "dp", None, "tp"))
        part = jax.vmap(raws["partial"], in_axes=(None, 0))(left_ecd, enc)
        resp_e, resp_m = jax.vmap(raws["response"], in_axes=(None, 0, 0))(
            chals, enc, mlwe)
        part = wsc(part, _ns(mesh, "dp", None, "tp"))
        resp_e = wsc(resp_e, _ns(mesh, "dp", None, "tp"))
        resp_m = wsc(resp_m, _ns(mesh, "dp", None, "tp"))
        return part, resp_e, resp_m

    return jax.jit(step)
