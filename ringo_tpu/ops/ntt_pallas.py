"""Pallas TPU kernel: fused matmul NTT for word-size RNS rings.

ops/ntt_matmul.py computes ntt∘mform (and intt∘imform) as an int8 MXU
matmul followed by an exact mod-q recombine.  Under XLA the int32 plane
sums [L, n, 5d] round-trip through HBM (~20 B/lane) between the matmul
and the VPU recombine; at the commit shapes that traffic bounds the whole
transform (measured ~1.2 ms for 2.2M lanes at logN17 — ~14% MXU).

This kernel keeps everything in VMEM per (prime, row-tile) grid step:

* byte-split the u32 residues in-register (4 offset int8 planes);
* one int8 MXU dot per byte plane against the resident [d, 5d] map block
  (int32 accumulation — exact, same bound as the XLA path);
* add the -128 offset correction column sums;
* recombine the five 7-bit-weighted planes to (lo, hi) u64-equivalent
  u32 pairs and reduce mod q with exactly TWO 2-digit Montgomery
  multiplies (the identical integer sequence as
  ops/mac_matmul.recombine_mod_q's fast path — bit-identical results);
* write only the final u32 residues (4 B/lane).

Per-prime scalars (q digits, -q^-1 mod 2^16, R%q and R^2%q digits) ride
in SMEM.  Bit-equality with the XLA path: tests/test_ntt_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.spec import DIGIT_BITS
from .mac_matmul import IN_PLANES, P7, SHIFT

TILE = 512  # rows per grid step: v tile 0.5 MB + acc 2.6 MB + map 1.3 MB


def _recombine_consts(primes) -> np.ndarray:
    """[L, 8] u32: q0, q1, qinv16, chi0, chi1, clo0, clo1, 0 — the same
    constants recombine_mod_q's fast path uses (R^2%q for the hi word,
    R%q for the lo word; Montgomery by 2 digits)."""
    R = 1 << (DIGIT_BITS * 2)
    out = np.zeros((len(primes), 8), dtype=np.uint32)
    for i, p in enumerate(primes):
        qinv = (-pow(p, -1, 1 << DIGIT_BITS)) % (1 << DIGIT_BITS)
        chi = R * R % p
        clo = R % p
        out[i] = (p & 0xFFFF, (p >> 16) & 0xFFFF, qinv,
                  chi & 0xFFFF, (chi >> 16) & 0xFFFF,
                  clo & 0xFFFF, (clo >> 16) & 0xFFFF, 0)
    return out


def _cond_sub2(t0, t1, top, q0, q1):
    """limb._cond_sub_q for w=2: reduce (t1:t0) + top*2^32 < 2q to [0, q)."""
    mask = jnp.uint32(0xFFFF)
    s = t0 - q0
    d0 = s & mask
    borrow = (s >> jnp.uint32(31)) & jnp.uint32(1)
    s = t1 - q1 - borrow
    d1 = s & mask
    borrow = (s >> jnp.uint32(31)) & jnp.uint32(1)
    use = (top != 0) | (borrow == 0)
    return jnp.where(use, d0, t0), jnp.where(use, d1, t1)


def _mont2(a0, a1, b0, b1, q0, q1, qinv):
    """2-digit CIOS Montgomery product — the exact integer sequence of
    fields/limb.mont_mul for w=2 (u32 lanes, scalar b/q/qinv), conditional
    subtract included.  Returns (r0, r1)."""
    mask = jnp.uint32(0xFFFF)
    zero = a0 * jnp.uint32(0)
    t0 = zero
    t1 = zero
    t2 = zero
    t3 = zero
    for bi in (b0, b1):
        # multiplication step: t += a * b[i]
        s = t0 + a0 * bi
        t0 = s & mask
        c = s >> jnp.uint32(DIGIT_BITS)
        s = t1 + a1 * bi + c
        t1 = s & mask
        c = s >> jnp.uint32(DIGIT_BITS)
        s = t2 + c
        t2 = s & mask
        t3 = s >> jnp.uint32(DIGIT_BITS)
        # reduction step: t = (t + m*q) / 2^16
        m = (t0 * qinv) & mask
        s = t0 + m * q0
        c = s >> jnp.uint32(DIGIT_BITS)
        s = t1 + m * q1 + c
        t0 = s & mask
        c = s >> jnp.uint32(DIGIT_BITS)
        s = t2 + c
        t1 = s & mask
        c = s >> jnp.uint32(DIGIT_BITS)
        t2 = t3 + c
    return _cond_sub2(t0, t1, t2, q0, q1)


def _kernel(d: int, v_ref, f_ref, corr_ref, cst_ref, o_ref):
    v = v_ref[0]                                   # [T, d] u32
    acc = None
    for a in range(IN_PLANES):  # accumulate across byte planes
        xa = ((v >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)).astype(jnp.int32)
        xa = (xa - 128).astype(jnp.int8)
        t = jax.lax.dot_general(
            xa, f_ref[0, a],                       # [d, 5d] int8
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)      # [T, 5d]
        acc = t if acc is None else acc + t
    acc = acc + corr_ref[0]                        # [T, 5d] + [1, 5d]

    # recombine: S = sum_b 2^(7b) * t_b as (lo, hi) u32 pair
    mask = jnp.uint32(0xFFFF)
    s_lo = None
    s_hi = None
    for b in range(P7):
        tb = acc[:, b * d:(b + 1) * d].astype(jnp.uint32)
        sh = SHIFT * b
        lo = tb << jnp.uint32(sh) if sh else tb
        hi = (tb >> jnp.uint32(32 - sh) if sh
              else jnp.zeros_like(tb))
        if s_lo is None:
            s_lo, s_hi = lo, hi
        else:
            s_lo = s_lo + lo
            s_hi = s_hi + hi + (s_lo < lo).astype(jnp.uint32)

    lid = pl.program_id(0)
    q0 = cst_ref[lid, 0]
    q1 = cst_ref[lid, 1]
    qinv = cst_ref[lid, 2]
    r_hi = _mont2(s_hi & mask, s_hi >> jnp.uint32(16),
                  cst_ref[lid, 3], cst_ref[lid, 4], q0, q1, qinv)
    r_lo = _mont2(s_lo & mask, s_lo >> jnp.uint32(16),
                  cst_ref[lid, 5], cst_ref[lid, 6], q0, q1, qinv)
    # add the two halves mod q (limb.add for w=2, scalar q)
    s0 = r_hi[0] + r_lo[0]
    c = s0 >> jnp.uint32(DIGIT_BITS)
    s0 = s0 & mask
    s1 = r_hi[1] + r_lo[1] + c
    c = s1 >> jnp.uint32(DIGIT_BITS)
    s1 = s1 & mask
    o0, o1 = _cond_sub2(s0, s1, c, q0, q1)
    o_ref[0] = o0 | (o1 << jnp.uint32(16))


_Z = np.int32(0)
_i32 = lambda v: jnp.asarray(v, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(v, f_planes, corr, cst, interpret=False):
    """v u32 [L, NT*T, d]; f_planes int8 [L, IN_PLANES, d, P7*d];
    corr int32 [L, 1, P7*d]; cst u32 [L, 8] (SMEM).
    Returns u32 [L, NT*T, d]."""
    L, N, d = v.shape
    nt = N // TILE
    grid = (L, nt)
    kern = functools.partial(_kernel, d)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE, d), lambda l, i: (_i32(l), _i32(i), _Z)),
            pl.BlockSpec((1, IN_PLANES, d, P7 * d),
                         lambda l, i: (_i32(l), _Z, _Z, _Z)),
            pl.BlockSpec((1, 1, P7 * d), lambda l, i: (_i32(l), _Z, _Z)),
            pl.BlockSpec(cst.shape, lambda l, i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, d),
                               lambda l, i: (_i32(l), _i32(i), _Z)),
        out_shape=jax.ShapeDtypeStruct((L, N, d), jnp.uint32),
        interpret=interpret,
    )(v, f_planes, corr, cst)


class PallasNTT:
    """Fused forward/inverse matmul-NTT plans for one ring, reusing
    MatmulNTT's plane tables (reshaped per byte plane)."""

    def __init__(self, mm):
        from . import devconst

        self.ring = mm.ring
        d = mm.ring.d
        L = mm.ring.L

        def reshape_planes(planes):
            # [L, IN_PLANES*d, P7*d] -> [L, IN_PLANES, d, P7*d]
            return np.ascontiguousarray(
                planes.reshape(L, IN_PLANES, d, P7 * d))

        self.fwd_planes = devconst.register(
            self, "fwd_planes", reshape_planes(mm.fwd_planes))
        self.inv_planes = devconst.register(
            self, "inv_planes", reshape_planes(mm.inv_planes))
        # corr from _split_planes_i8 is [L, 1, P7*d] int32 already
        self.fwd_corr = devconst.register(self, "fwd_corr", mm.fwd_corr)
        self.inv_corr = devconst.register(self, "inv_corr", mm.inv_corr)
        self.cst = devconst.register(
            self, "cst", _recombine_consts(mm.ring.primes))

    def _apply(self, planes_name, corr_name, x, interpret=False):
        """x digit pairs [2, L, *lead, d] u32 -> same shape."""
        from . import devconst

        d = self.ring.d
        L = self.ring.L
        lead = x.shape[2:-1]
        v = (x[0] | (x[1] << jnp.uint32(DIGIT_BITS))).reshape(L, -1, d)
        n = v.shape[1]
        n_pad = -(-n // TILE) * TILE
        if n_pad != n:
            v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
        out = _run(v, devconst.get(self, planes_name),
                   devconst.get(self, corr_name),
                   devconst.get(self, "cst"), interpret=interpret)
        out = out[:, :n, :].reshape((L,) + lead + (d,))
        return jnp.stack([out & jnp.uint32(0xFFFF),
                          out >> jnp.uint32(DIGIT_BITS)])

    def ntt_mform(self, x, interpret=False):
        return self._apply("fwd_planes", "fwd_corr", x, interpret)

    def intt_imform(self, x, interpret=False):
        return self._apply("inv_planes", "inv_corr", x, interpret)
