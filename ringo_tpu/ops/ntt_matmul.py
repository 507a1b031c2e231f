"""Exact matmul NTT for word-size RNS rings — the MXU path.

For the Jindo commitment rings the degree is always d = 256
(jindo/params.py: d = max(k, 256)), so the negacyclic NTT is just a [d, d]
linear map per prime.  Instead of log2(d) butterfly stages of digit-plane
Montgomery muls (a ~1000-op HLO graph per transform), the transform is ONE
batched int8 matmul per prime with exact integer semantics (the v5e int8
MXU path accumulates in int32 natively):

* residues x < 2^32 split into 4 byte planes offset by -128 (signed int8),
  stacked along the contraction axis — a 4d contraction instead of the 5d
  a symmetric 7-bit split would need;
* the map M (with the Montgomery/mform and 1/n factors folded in) is
  expanded asymmetrically: F[(a,j),(b,e)] = ((2^8a * M[j,e] mod q)
  >> 7b) & 127 (7-bit output pieces keep F in non-negative int8);
* T = x_planes @ F on the MXU plus the constant offset correction
  128 * colsum(F): true column sums < 255 * 127 * 4d < 2^27, exact in the
  int32 accumulator;
* the output planes recombine y = sum_b 2^7b * T_b mod q with u32
  digit-plane Montgomery multiplies (ops/mac_matmul.recombine_mod_q) —
  all-integer, no software-emulated f64.

Bit-identical to ops/ntt.py's stage engine composed with mform/imform
(tested in tests/test_ntt_matmul.py).
"""

from __future__ import annotations

import numpy as np

from ..fields.spec import DIGIT_BITS
from . import ntt as nttmod
from .mac_matmul import P7, PMAX, SHIFT, recombine_mod_q

MAX_D = 256  # 127^2 * P7 * d < 2^31 holds far beyond this; kept at the
             # commit-ring degree so map tables stay O(d^2) small


def _build_maps(primes, d: int):
    """Host: forward map ntt∘mform and inverse map intt∘imform as exact
    integer matrices [L, d, d] (per-prime uint64)."""
    br = nttmod.bit_reverse_permutation(d)
    R = 1 << (DIGIT_BITS * 2)
    fwd = np.zeros((len(primes), d, d), dtype=np.uint64)
    inv = np.zeros((len(primes), d, d), dtype=np.uint64)
    for l, q in enumerate(primes):
        from ..fields.spec import FieldSpec
        spec = FieldSpec(p=q, b=q - 1, k=1)
        psi = spec.find_generator(d, True)
        psi_inv = pow(psi, -1, q)
        n_inv = pow(d, -1, q)
        r_inv = pow(R, -1, q)
        # out[i] = sum_j x[j] * psi^(j*(2*br(i)+1)) * R   (mform folded)
        e = (2 * br + 1) % (2 * d)
        pw = np.ones(2 * d, dtype=np.uint64)
        for t in range(1, 2 * d):
            pw[t] = pw[t - 1] * psi % q
        pwi = np.ones(2 * d, dtype=np.uint64)
        for t in range(1, 2 * d):
            pwi[t] = pwi[t - 1] * psi_inv % q
        j_idx = np.arange(d, dtype=np.uint64)
        for i in range(d):
            texp = (j_idx * np.uint64(e[i])) % np.uint64(2 * d)
            fwd[l, :, i] = pw[texp.astype(np.int64)] * np.uint64(R % q) % np.uint64(q)
            inv[l, i, :] = (pwi[texp.astype(np.int64)]
                            * np.uint64(n_inv * r_inv % q)) % np.uint64(q)
    return fwd, inv


def _split_planes_i8(M: np.ndarray, primes):
    """[L, d, d] u64 map -> asymmetric int8 planes [L, IN_PLANES*d, P7*d]
    with planes[l, a*d + j, b*d + e] = ((2^8a * M[l,j,e] mod q) >> 7b) & 127
    (byte-grain input weights, 7-bit output pieces), plus the -128-offset
    correction colsum [L, 1, P7*d] = 128 * sum over the contraction axis.

    Kept numpy (embeds as an HLO constant): plans are built lazily, possibly
    under an active trace, where creating device arrays would leak tracers."""
    from .mac_matmul import IN_PLANES

    L, d, _ = M.shape
    qs = np.array(primes, dtype=np.uint64).reshape(L, 1, 1)
    out = np.zeros((L, IN_PLANES * d, P7 * d), dtype=np.int8)
    for a in range(IN_PLANES):
        Ma = (M << np.uint64(8 * a)) % qs
        for b in range(P7):
            out[:, a * d:(a + 1) * d, b * d:(b + 1) * d] = \
                ((Ma >> np.uint64(SHIFT * b)) & np.uint64(PMAX)
                 ).astype(np.int8)
    corr = (128 * out.astype(np.int64).sum(axis=1, keepdims=True)
            ).astype(np.int32)
    return out, corr


class MatmulNTT:
    """Per-ring matmul NTT plans (jax-only; host path keeps the stage NTT)."""

    def __init__(self, ring):
        if ring.d > MAX_D:
            raise ValueError(f"matmul NTT requires d <= {MAX_D}")
        from . import devconst

        self.ring = ring
        fwd, inv = _build_maps(ring.primes, ring.d)
        # registered so stage programs can pass the ~MB plane tables as jit
        # arguments instead of inline HLO constants (ops/devconst.py)
        self.fwd_planes, self.fwd_corr = (
            devconst.register(self, n, a) for n, a in
            zip(("fwd_planes", "fwd_corr"),
                _split_planes_i8(fwd, ring.primes)))
        self.inv_planes, self.inv_corr = (
            devconst.register(self, n, a) for n, a in
            zip(("inv_planes", "inv_corr"),
                _split_planes_i8(inv, ring.primes)))

    def _apply(self, planes_tbl, corr, x):
        """x: digit planes [2, L, *batch, d] u32 (plain residues).
        Returns digit planes of (map @ x) mod q."""
        import jax
        import jax.numpy as jnp

        from .mac_matmul import IN_PLANES

        ring = self.ring
        L, d = ring.L, ring.d
        lead = x.shape[2:-1]
        v = (x[0] | (x[1] << jnp.uint32(DIGIT_BITS))).reshape(L, -1, d)
        # offset byte planes of the input along the contraction [L, n, 4d]
        xa = jnp.concatenate(
            [(((v >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)
               ).astype(jnp.int32) - 128).astype(jnp.int8)
             for a in range(IN_PLANES)], axis=2)
        t = jax.lax.dot_general(
            xa, planes_tbl,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)       # [L, n, 5d]
        t = t + jnp.asarray(corr)                   # undo the -128 offset
        t = t.reshape(L, -1, P7, 1, d)
        out = recombine_mod_q(ring, t, jnp)          # [L, n, 1, d]
        out = out.reshape(L, *lead, d)
        return jnp.stack([out & jnp.uint32(0xFFFF),
                          out >> jnp.uint32(DIGIT_BITS)])

    def ntt_mform(self, x):
        """= ring.ntt(ring.mform(x)) for plain-domain x."""
        from . import devconst
        return self._apply(devconst.get(self, "fwd_planes"),
                           devconst.get(self, "fwd_corr"), x)

    def intt_imform(self, x):
        """= ring.intt(ring.imform(x)) for NTT/Montgomery-domain x."""
        from . import devconst
        return self._apply(devconst.get(self, "inv_planes"),
                           devconst.get(self, "inv_corr"), x)
