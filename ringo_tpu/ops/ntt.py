"""Stage-vectorized NTT over fixed-limb digit planes.

TPU-native replacement for the reference's unrolled scalar NTTs
(math/bigpoly/ntt.go:246-466) and, with w=2 digit planes, for lattigo's
uint64 ring NTT.  Instead of 8-wide manual unrolling, each Cooley-Tukey /
Gentleman-Sande stage is one whole-array reshape + vectorized Montgomery
butterfly over every batch element at once; XLA fuses the digit-plane
arithmetic into a handful of VPU loops.

Conventions (identical to the reference so slot-permutation logic like the
NTT-domain automorphism carries over):

* forward = Cooley-Tukey DIT, natural-order coefficients in, bit-reversed
  evaluations out;
* negacyclic (X^N+1): out[i] = p(psi^(2*br_N(i)+1)) for an order-2N root psi;
* cyclic (X^N-1):     out[i] = p(g^(br_N(i))) for an order-N generator g;
* inverse = Gentleman-Sande, multiplied by N^{-1} at the end.

Twiddle tables are generated on host with exact Python ints and stored in
Montgomery form, one table T of length N where stage m uses T[m:2m]
(the reference's tw[m+i] layout, math/bigpoly/ntt.go:67-84,183-192).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec


def bit_reverse_permutation(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


@functools.lru_cache(maxsize=None)
def _tables_host(p: int, b: int, k: int, n: int, negacyclic: bool,
                 generator: int | None = None):
    """Host twiddle generation (exact ints).  Returns (tw, twinv, ninv) as
    plain ints: tw/twinv length-n lists with stage m using tw[m:2m].
    ``generator`` overrides the canonical root (used by the four-step
    sharded NTT, whose sub-transforms must use powers of one fixed root)."""
    spec = FieldSpec(p=p, b=b, k=k)
    br = bit_reverse_permutation

    if negacyclic:
        g = generator if generator is not None else spec.find_generator(n, True)
        ginv = spec.inverse(g)
        pw, pwinv = [1] * n, [1] * n
        for i in range(1, n):
            pw[i] = pw[i - 1] * g % p
            pwinv[i] = pwinv[i - 1] * ginv % p
        perm = br(n)
        tw = [pw[0]] * n
        twinv = [pwinv[0]] * n
        for i in range(n):
            tw[perm[i]] = pw[i]
            twinv[perm[i]] = pwinv[i]
    else:
        g = generator if generator is not None else spec.find_generator(n, False)
        ginv = spec.inverse(g)
        h = n // 2
        pw, pwinv = [1] * h, [1] * h
        for i in range(1, h):
            pw[i] = pw[i - 1] * g % p
            pwinv[i] = pwinv[i - 1] * ginv % p
        perm = br(h) if h > 0 else np.zeros(0, dtype=np.int64)
        twref = [0] * h
        twinvref = [0] * h
        for i in range(h):
            twref[perm[i]] = pw[i]
            twinvref[perm[i]] = pwinv[i]
        tw = [1] * n
        twinv = [1] * n
        m = 1
        while m <= h:
            for i in range(m):
                tw[m + i] = twref[i]
                twinv[m + i] = twinvref[i]
            m <<= 1
    ninv = spec.inverse(n)
    return tw, twinv, ninv


class NTTPlan:
    """Precomputed digit-plane twiddles for size-n (nega)cyclic NTT."""

    def __init__(self, spec: FieldSpec, n: int, negacyclic: bool):
        if n & (n - 1):
            raise ValueError("n must be a power of two")
        if (spec.p - 1) % (2 * n) != 0:
            raise ValueError("NTT not supported: 2n must divide p-1")
        self.spec = spec
        self.n = n
        self.negacyclic = negacyclic
        tw, twinv, ninv = _tables_host(spec.p, spec.b, spec.k, n, negacyclic)
        R = spec.R
        p = spec.p
        self.tw = limb.ints_to_digits([t * R % p for t in tw], spec.w)
        self.twinv = limb.ints_to_digits([t * R % p for t in twinv], spec.w)
        self.ninv = limb.ints_to_digits([ninv * R % p], spec.w)[:, 0]
        self.q = spec.p_digits
        self.qinv16 = spec.qinv16


def _expand(c, vndim):
    """Reshape a constant [w, *lead(, m)] so it broadcasts against a value
    [w, *lead, *batch(, m, t)]: singleton batch dims are inserted after the
    lead axes (used for per-prime RNS tables, where lead = (L,))."""
    return c.reshape(*c.shape[:-1], *([1] * (vndim - c.ndim)), c.shape[-1])


def _expand_qinv(xp, qinv16, value_ndim):
    """qinv16: python int (single modulus) or [*lead] array (per-prime).
    Constants stay numpy so they embed as HLO constants under tracing
    (eager device ops during trace are catastrophic over a TPU tunnel)."""
    if isinstance(qinv16, int):
        return qinv16
    c = np.asarray(qinv16)[..., None]
    return c.reshape(*c.shape[:-1], *([1] * (value_ndim - c.ndim)), 1)


def _butterfly_ct(x, twm, q, qinv16):
    """One CT stage: x viewed as [w, *lead, *batch, m, 2, t];
    twm [w, *lead, m]; q [w, *lead, 1]."""
    u = x[..., 0, :]
    v = x[..., 1, :]
    xp = limb.get_xp(x)
    twb = _expand(twm, u.ndim - 1)[..., None]
    qb = _expand(q, u.ndim)
    qinvb = _expand_qinv(xp, qinv16, u.ndim - 1)
    vw = limb.mont_mul(v, twb, qb, qinvb)
    return xp.stack([limb.add(u, vw, qb), limb.sub(u, vw, qb)], axis=-2)


def _butterfly_gs(x, twm, q, qinv16):
    u = x[..., 0, :]
    v = x[..., 1, :]
    xp = limb.get_xp(x)
    twb = _expand(twm, u.ndim - 1)[..., None]
    qb = _expand(q, u.ndim)
    qinvb = _expand_qinv(xp, qinv16, u.ndim - 1)
    s = limb.add(u, v, qb)
    d = limb.mont_mul(limb.sub(u, v, qb), twb, qb, qinvb)
    return xp.stack([s, d], axis=-2)


def ntt_fwd(plan, x):
    """Forward NTT over the last axis; x shaped [w, *lead, *batch, n]."""
    n = plan.n
    shape = x.shape
    tw = np.asarray(plan.tw)  # numpy: embeds as constants under tracing
    q = np.asarray(plan.q)[..., None]
    m = 1
    while m <= n // 2:
        t = n // (2 * m)
        x = x.reshape(*shape[:-1], m, 2, t)
        x = _butterfly_ct(x, tw[..., m:2 * m], q, plan.qinv16)
        x = x.reshape(shape)
        m <<= 1
    return x


def ntt_inv(plan, x):
    """Inverse NTT over the last axis (includes the 1/n scaling)."""
    xp = limb.get_xp(x)
    n = plan.n
    shape = x.shape
    twinv = np.asarray(plan.twinv)
    q = np.asarray(plan.q)[..., None]
    m = n // 2
    while m >= 1:
        t = n // (2 * m)
        x = x.reshape(*shape[:-1], m, 2, t)
        x = _butterfly_gs(x, twinv[..., m:2 * m], q, plan.qinv16)
        x = x.reshape(shape)
        m >>= 1
    qb = _expand(q, x.ndim)
    ninv = _expand(np.asarray(plan.ninv)[..., None], x.ndim)
    qinvb = _expand_qinv(xp, plan.qinv16, x.ndim - 1)
    return limb.mont_mul(x, ninv, qb, qinvb)


def aut_ntt_permutation(n: int, idx: int) -> np.ndarray:
    """Slot permutation realizing X -> X^idx on negacyclic NTT values.

    With out[i] = p(psi^(2*br(i)+1)), Aut_idx(p)(psi^(2*br(i)+1))
    = p(psi^((2*br(i)+1)*idx)), so slot i reads from the slot j whose
    exponent is (2*br(i)+1)*idx mod 2n.  (Reference: autNTTTo,
    math/bigpoly/cyclotomic.go:67-82.)
    """
    br = bit_reverse_permutation(n)
    brinv = np.argsort(br)
    e = (2 * br + 1) * idx % (2 * n)
    return brinv[(e - 1) // 2]


def aut_coeff_maps(n: int, idx: int) -> tuple[np.ndarray, np.ndarray]:
    """Coefficient-domain automorphism X -> X^idx on X^n+1: returns
    (dst_index, sign) with out[dst[i]] = sign[i] * in[i]
    (reference autTo, math/bigpoly/cyclotomic.go:49-64)."""
    i = np.arange(n)
    j = (i * idx) % (2 * n)
    sign = np.where(j < n, 1, -1).astype(np.int8)
    dst = np.where(j < n, j, j - n)
    return dst, sign
