"""Exact matmul NTT for word-size RNS rings — the MXU path.

For the Jindo commitment rings the degree is always d = 256
(jindo/params.py: d = max(k, 256)), so the negacyclic NTT is just a [d, d]
linear map per prime.  Instead of log2(d) butterfly stages of digit-plane
Montgomery muls (a ~1000-op HLO graph per transform), the transform is 16
batched bf16 matmuls with exact integer semantics:

* residues x < q < 2^30 split into 4 byte planes x_a (exact in bf16);
* the map M (with the Montgomery/mform and 1/n factors folded in) is
  expanded per byte weight: M_ab = ((2^(8a) * M mod q) >> 8b) & 255;
* P_ab = x_a @ M_ab on the MXU: products <= 255^2 and partial sums
  <= 255^2 * 256 < 2^24, so the f32 accumulator is exact;
* T_b = sum_a P_ab as int32 (< 2^26), recombined y = sum_b 2^(8b) * T_b in
  float64 (< 2^52, exact) and Barrett-reduced mod q with +/-1 correction.

Bit-identical to ops/ntt.py's stage engine composed with mform/imform
(tested in tests/test_ntt_matmul.py).  Requires d <= 256 (the 2^24 bound).
"""

from __future__ import annotations

import numpy as np

from ..fields.spec import DIGIT_BITS
from . import ntt as nttmod

MAX_D = 256


def _build_maps(primes, d: int):
    """Host: forward map ntt∘mform and inverse map intt∘imform as exact
    integer matrices [L, d, d] (Python ints -> object arrays avoided by
    per-prime uint64)."""
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
        # exponent table via repeated squaring per (j, i) is O(d^2 log) —
        # use powers: psi_pows[t] = psi^t mod q for t < 2d
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


def _split_planes(M: np.ndarray, primes) -> np.ndarray:
    """[L, d, d] u64 map -> bf16 byte planes [4, 4, L, d, d]:
    planes[a, b] = ((2^(8a) * M mod q) >> 8b) & 255."""
    import jax.numpy as jnp

    L, d, _ = M.shape
    qs = np.array(primes, dtype=np.uint64).reshape(L, 1, 1)
    out = np.zeros((4, 4, L, d, d), dtype=np.float32)
    for a in range(4):
        Ma = (M << np.uint64(8 * a)) % qs
        for b in range(4):
            out[a, b] = ((Ma >> np.uint64(8 * b)) & np.uint64(255)
                         ).astype(np.float32)
    return out.astype(jnp.bfloat16)


class MatmulNTT:
    """Per-ring matmul NTT plans (jax-only; host path keeps the stage NTT)."""

    def __init__(self, ring):
        if ring.d > MAX_D:
            raise ValueError(f"matmul NTT requires d <= {MAX_D}")
        self.ring = ring
        fwd, inv = _build_maps(ring.primes, ring.d)
        self.fwd_planes = _split_planes(fwd, ring.primes)  # [4,4,L,d,d] bf16
        self.inv_planes = _split_planes(inv, ring.primes)
        self.qs_f64 = np.array(ring.primes, dtype=np.float64).reshape(-1, 1)
        self.inv_qs = 1.0 / self.qs_f64

    def _apply(self, planes_tbl, x):
        """x: digit planes [2, L, *batch, d] u32 (plain residues).
        Returns digit planes of (map @ x) mod q."""
        import jax.numpy as jnp

        ring = self.ring
        L, d = ring.L, ring.d
        lead = x.shape[2:-1]
        v = (x[0] | (x[1] << jnp.uint32(DIGIT_BITS))).reshape(L, -1, d)
        # byte planes of the input, bf16 [4, L, n, d]
        xa = jnp.stack([((v >> jnp.uint32(8 * a)) & jnp.uint32(255))
                        for a in range(4)]).astype(jnp.bfloat16)
        acc = None
        for b in range(4):
            tb = None
            for a in range(4):
                # each matmul output <= 255^2 * d < 2^24: exact in f32;
                # the 4-term sum can exceed 2^24, so accumulate in int32
                p = jnp.einsum("lnd,lde->lne", xa[a], planes_tbl[a, b],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
                tb = p if tb is None else tb + p
            tb64 = tb.astype(jnp.float64) * float(1 << (8 * b))
            acc = tb64 if acc is None else acc + tb64
        # Barrett reduction: acc < 2^52 exact in f64
        q = self.qs_f64.reshape(L, 1, 1)
        m = jnp.floor(acc * self.inv_qs.reshape(L, 1, 1))
        r = acc - m * q
        r = jnp.where(r < 0, r + q, r)
        r = jnp.where(r >= q, r - q, r)
        out = r.astype(jnp.uint32).reshape(L, *lead, d)
        return jnp.stack([out & jnp.uint32(0xFFFF),
                          out >> jnp.uint32(DIGIT_BITS)])

    def ntt_mform(self, x):
        """= ring.ntt(ring.mform(x)) for plain-domain x."""
        return self._apply(self.fwd_planes, x)

    def intt_imform(self, x):
        """= ring.intt(ring.imform(x)) for NTT/Montgomery-domain x."""
        return self._apply(self.inv_planes, x)
