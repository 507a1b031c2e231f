"""Sharded Buckler first-round step: the PIOP prover's per-witness work
(randomized interpolation encode -> embedding-ring NTT, reference
buckler/prover.go:141-206) batched over a ``dp`` mesh axis and fused with
the Jindo commitment core (dp over witnesses, tp over RNS planes, sp over
MSIS rank — same axes as parallel/commit.py).

This is the scale-out shape of a Buckler prove: each first-round witness is
independent until the Fiat-Shamir absorption, so a t-witness circuit
spreads its encodes/NTTs/commits across data-parallel devices and only the
commitment digests return to the host transcript.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from ..fields import limb
from .commit import _ns


def build_sharded_buckler_round(bk_prover, mesh: Mesh):
    """Returns a jitted fn
    ``(w_planes [t, w, rank], blinds [t, w], e_i64 [t, B, R, d],
       noise_i64 [t, B, K, d], pk_inml, pk_out) ->
      (w_ecd [t, w, emb], w_ntt [t, w, emb], in_commit [t, ...],
       outer [t, ...])``
    computing the randomized encodes + embedding NTTs + Jindo commit cores
    for t first-round witnesses over the mesh."""
    ecd = bk_prover.ecd
    ring = bk_prover.poly_ring
    jraw = bk_prover.jindo.raw_stages()["commit_core"]
    spec = bk_prover.spec
    rank = bk_prover.ctx.rank
    emb = ring.rank
    w = spec.w
    pd = spec.p_digits.reshape(w, 1)
    wsc = jax.lax.with_sharding_constraint

    def enc_one(wv, bl):
        """rand_encode (cyclic INTT + X^rank blind, encoder.go:50-54) +
        forward NTT in the embedding ring."""
        import jax.numpy as jnp

        coeffs = ecd.dev_plan.inv(wv[:, :rank])
        c0 = limb.sub(coeffs[:, 0:1], bl[:, None], pd)
        pad = jnp.zeros((w, emb - rank - 1), dtype=jnp.uint32)
        e = jnp.concatenate([c0, coeffs[:, 1:rank], bl[:, None], pad],
                            axis=1)
        return e, ring.dev_plan.fwd(e)

    def step(w_planes, blinds, e_i64, noise_i64, pk_inml, pk_out):
        w_planes = wsc(w_planes, _ns(mesh, "dp"))
        blinds = wsc(blinds, _ns(mesh, "dp"))
        e_i64 = wsc(e_i64, _ns(mesh, "dp"))
        noise_i64 = wsc(noise_i64, _ns(mesh, "dp"))
        w_ecd, w_ntt = jax.vmap(enc_one)(w_planes, blinds)
        w_ecd = wsc(w_ecd, _ns(mesh, "dp"))
        w_ntt = wsc(w_ntt, _ns(mesh, "dp"))
        enc, mlwe, ic, outer = jax.vmap(
            jraw, in_axes=(0, 0, None, None))(e_i64, noise_i64,
                                              pk_inml, pk_out)
        ic = wsc(ic, _ns(mesh, "dp", None, "tp", "sp"))
        outer = wsc(outer, _ns(mesh, "dp", None, "tp", "sp"))
        return w_ecd, w_ntt, ic, outer

    return jax.jit(step)
