"""Generic fixed-limb modular arithmetic kernels (the TPU replacement for the
reference's generated Montgomery assembly).

Values are arrays of shape ``[w, ...]`` — digit-major planes of 16-bit digits
held in uint32 lanes, little-endian.  Every kernel is elementwise over the
trailing axes, so the same code vectorizes a single 880-bit field element or a
[L, batch, degree] tensor of 30-bit RNS residues.

All products are 16x16 -> 32 bits and every intermediate fits uint32 exactly
(Montgomery CIOS with 16-bit digits: t[j] + a[j]*b[i] + c <= 2^32 - 1), which
is the whole point: TPU integer lanes are 32-bit, so base-2^16 digits give
exact wide arithmetic with native ops only.

Reference counterparts: jindo/internal/zp/element.go (Mul/Add/Sub/Neg, CIOS at
element.go:481-600), asm/element_4w_amd64.s vector kernels, and lattigo's
uint64 Montgomery loops — all subsumed by these planes.

The ``xp`` module (numpy or jax.numpy) is inferred from the input arrays, so
the identical code runs on host for tests and inside jit/pallas on TPU.
"""

from __future__ import annotations

import numpy as np

from .spec import DIGIT_BITS, DIGIT_MASK

try:
    import jax.numpy as jnp
    import jax
except Exception:  # pragma: no cover
    jnp = None
    jax = None


def get_xp(*arrays):
    """numpy unless any argument is a jax array/tracer (constants are often
    numpy while values are traced)."""
    for a in arrays:
        if a is None or isinstance(a, (int, float, np.ndarray, np.generic)):
            continue
        return jnp
    return np


def _u32(xp, v):
    return xp.uint32(v)


# ---------------------------------------------------------------------------
# internal helpers on digit *lists* (length w, each an array)
# ---------------------------------------------------------------------------

def _unstack(a):
    return [a[j] for j in range(a.shape[0])]


def _stack(xp, digits):
    return xp.stack(digits, axis=0)


def _bcast(xp, digits, shape_like):
    """Broadcast each digit of a constant against a value digit array."""
    return [xp.asarray(d) for d in digits]


def _sub_borrow(xp, a, b):
    """a - b digitwise; returns (diff digits, final borrow in {0,1})."""
    w = len(a)
    mask = _u32(xp, DIGIT_MASK)
    borrow = _u32(xp, 0)
    out = []
    for j in range(w):
        s = a[j] - b[j] - borrow  # wraps mod 2^32
        out.append(s & mask)
        borrow = (s >> 31) & _u32(xp, 1)  # borrow iff wrapped: top bit set
    return out, borrow


def _add_carry(xp, a, b):
    w = len(a)
    mask = _u32(xp, DIGIT_MASK)
    carry = _u32(xp, 0)
    out = []
    for j in range(w):
        s = a[j] + b[j] + carry
        out.append(s & mask)
        carry = s >> DIGIT_BITS
    return out, carry


def _select(xp, cond, a, b):
    """Digit-wise select: cond ? a : b (cond broadcastable bool)."""
    return [xp.where(cond, x, y) for x, y in zip(a, b)]


def _cond_sub_q(xp, t, top, q):
    """Reduce t (+ top*2^(16w)) < 2q into [0, q): subtract q if needed."""
    diff, borrow = _sub_borrow(xp, t, q)
    use_diff = (top != 0) | (borrow == 0)
    return _select(xp, use_diff, diff, t)


# ---------------------------------------------------------------------------
# public kernels — arrays shaped [w, ...]
# ---------------------------------------------------------------------------

def add(a, b, q):
    """(a + b) mod q for normalized inputs."""
    xp = get_xp(a, b)
    t, carry = _add_carry(xp, _unstack(a), _unstack(b))
    return _stack(xp, _cond_sub_q(xp, t, carry, _unstack(xp.asarray(q))))


def sub(a, b, q):
    """(a - b) mod q for normalized inputs."""
    xp = get_xp(a, b)
    diff, borrow = _sub_borrow(xp, _unstack(a), _unstack(b))
    qd = _unstack(xp.asarray(q))
    # fixed = diff + q (absorbs the borrow)
    fixed, _ = _add_carry(xp, diff, [d * 0 + qq for d, qq in zip(diff, qd)])
    return _stack(xp, _select(xp, borrow != 0, fixed, diff))


def neg(a, q):
    """(-a) mod q."""
    xp = get_xp(a)
    ad = _unstack(a)
    qd = _unstack(xp.asarray(q))
    diff, _ = _sub_borrow(xp, [d * 0 + qq for d, qq in zip(ad, qd)], ad)
    zero = is_zero(a)
    return _stack(xp, _select(xp, zero, [d * 0 for d in ad], diff))


def is_zero(a):
    xp = get_xp(a)
    acc = None
    for d in _unstack(a):
        acc = (d == 0) if acc is None else (acc & (d == 0))
    return acc


def eq(a, b):
    xp = get_xp(a, b)
    acc = None
    for x, y in zip(_unstack(a), _unstack(b)):
        acc = (x == y) if acc is None else (acc & (x == y))
    return acc


def geq(a, b):
    """a >= b as multi-digit unsigned compare."""
    xp = get_xp(a, b)
    _, borrow = _sub_borrow(xp, _unstack(a), _unstack(b))
    return borrow == 0


def cmp(a, b):
    """3-way multi-digit unsigned compare: -1/0/+1 as int32 (reference
    element Cmp, jindo/internal/zp/element.go)."""
    xp = get_xp(a, b)
    ge = geq(a, b)
    le = geq(b, a)
    return ge.astype(xp.int32) - le.astype(xp.int32)


def bit_len(a):
    """Bit length of each element (reference element BitLen): position of
    the highest set bit across the digit planes, 0 for zero."""
    xp = get_xp(a)
    ad = _unstack(a)
    out = None
    for j, d in enumerate(ad):
        v = d.astype(xp.int32)
        # per-digit bit length by comparison against powers of two — no
        # transcendentals (TPU f64 log2 is software-emulated and not
        # guaranteed correctly rounded at exact powers of two)
        bl = xp.zeros_like(v)
        for b in range(16):
            bl = bl + (v >= (1 << b)).astype(xp.int32)
        cand = xp.where(v > 0, bl + 16 * j, 0)
        out = cand if out is None else xp.maximum(out, cand)
    return out


def nonzero_idx(xp, mask, size: int):
    """First ``size`` indices of true lanes, padded with len(mask) — the
    semantics of ``jnp.nonzero(mask, size=..., fill_value=len(mask))`` but
    via cumsum + a binary search: jnp.nonzero's sort-based TPU lowering
    costs ~600ms on 8.5M lanes, this is three memory passes."""
    if xp is np:
        (nz,) = np.nonzero(mask)
        out = np.full(size, mask.shape[0], dtype=np.int64)
        out[:len(nz[:size])] = nz[:size]
        return out
    cs = xp.cumsum(mask.astype(xp.int32))
    k = xp.arange(1, size + 1, dtype=xp.int32)
    return xp.searchsorted(cs, k, side="left")


def mont_mul(a, b, q, qinv16):
    """Montgomery product a*b*R^{-1} mod q, R = 2^(16w).  CIOS.

    ``q``: [w, ...] broadcastable digit array; ``qinv16``: -q^{-1} mod 2^16,
    scalar or broadcastable array.
    """
    xp = get_xp(a, b)
    ad = _unstack(a)
    bd = _unstack(b)
    qd = _unstack(xp.asarray(q))
    w = len(ad)
    mask = _u32(xp, DIGIT_MASK)
    qinv = xp.asarray(qinv16).astype(xp.uint32) if not isinstance(qinv16, int) else _u32(xp, qinv16)

    zero = ad[0] * bd[0] * _u32(xp, 0)  # broadcast-shaped zero
    t = [zero for _ in range(w + 2)]

    for i in range(w):
        # multiplication step: t += a * b[i]
        c = _u32(xp, 0)
        for j in range(w):
            s = t[j] + ad[j] * bd[i] + c  # fits u32 exactly
            t[j] = s & mask
            c = s >> DIGIT_BITS
        s = t[w] + c
        t[w] = s & mask
        t[w + 1] = s >> DIGIT_BITS
        # reduction step: t = (t + m*q) / 2^16
        m = (t[0] * qinv) & mask
        s = t[0] + m * qd[0]
        c = s >> DIGIT_BITS
        for j in range(1, w):
            s = t[j] + m * qd[j] + c
            t[j - 1] = s & mask
            c = s >> DIGIT_BITS
        s = t[w] + c
        t[w - 1] = s & mask
        c = s >> DIGIT_BITS
        t[w] = t[w + 1] + c

    return _stack(xp, _cond_sub_q(xp, t[:w], t[w], qd))


def mont_sqr(a, q, qinv16):
    return mont_mul(a, a, q, qinv16)


def reduce_once(a, q):
    """a mod q for a < 2q (single conditional subtract)."""
    xp = get_xp(a)
    return _stack(xp, _cond_sub_q(xp, _unstack(a), _u32(xp, 0), _unstack(xp.asarray(q))))


def divmod_small(a, y):
    """Long division of digit arrays by a small scalar y (< 2^25).

    Returns (quotient digits u32 [w, ...], remainder u32 [...]).
    Each step divides cur = r*2^16 + digit < y*2^16 <= 2^41 by y — done in
    float64 (exact: all quantities < 2^53) with a +/-1 correction for the
    division rounding, avoiding u64 division (whose constant-divisor
    expansion blows up the TPU compiler when unrolled w*k times).
    Reference counterpart: jindo/utils.go:12-18 (divMod64).
    """
    xp = get_xp(a)
    ad = _unstack(a)
    w = len(ad)
    if isinstance(y, int) and y >= (1 << 25):
        # the f64 reciprocal path and its single-step corrections assume
        # cur < 2^41, i.e. y < 2^25 (the jindo-modulus generator enforces
        # b <= 2^25, jindo-modulus/main.go:31-71) — fail loudly, not wrongly
        raise ValueError(f"divmod_small requires y < 2^25, got {y}")
    yf = float(y) if isinstance(y, int) else xp.asarray(y).astype(xp.float64)
    inv_y = 1.0 / yf  # reciprocal-mul: quotient estimate off by at most 1
    r = ad[-1].astype(xp.float64) * 0.0
    out = [None] * w
    scale = float(1 << DIGIT_BITS)
    for j in reversed(range(w)):
        cur = r * scale + ad[j].astype(xp.float64)  # < 2^41, exact
        q = xp.floor(cur * inv_y)
        r = cur - q * yf  # exact: both products < 2^42
        # correct the +/-1 of the reciprocal estimate
        q = xp.where(r < 0, q - 1.0, q)
        r = xp.where(r < 0, r + yf, r)
        q = xp.where(r >= yf, q + 1.0, q)
        r = xp.where(r >= yf, r - yf, r)
        out[j] = q.astype(xp.uint32)
    return _stack(xp, out), r.astype(xp.uint32)


def mul_small_add(a, y, c):
    """a * y + c for small scalar y (y < 2^16) and small addend c (< 2^16);
    result stays w digits assuming it fits (used for base-b recomposition
    checks in tests)."""
    xp = get_xp(a)
    ad = _unstack(a)
    mask = _u32(xp, DIGIT_MASK)
    carry = xp.asarray(c).astype(xp.uint32) if not isinstance(c, int) else _u32(xp, c)
    yv = _u32(xp, y) if isinstance(y, int) else xp.asarray(y).astype(xp.uint32)
    out = []
    for j in range(len(ad)):
        s = ad[j] * yv + carry
        out.append(s & mask)
        carry = s >> DIGIT_BITS
    return _stack(xp, out)


def _take(a, start, stop, axis):
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(start, stop)
    return a[tuple(sl)]


def modsum(a, q, axis: int):
    """Modular reduction-sum along ``axis`` (tree of conditional-subtract
    adds), removing that axis.  a: [w, ...]; ``axis`` counts value dims
    (0 = first dim after the digit axis)."""
    xp = get_xp(a)
    ax = axis + 1  # skip digit axis
    while a.shape[ax] > 1:
        n = a.shape[ax]
        half = n // 2
        s = add(_take(a, 0, half, ax), _take(a, half, 2 * half, ax), q)
        if n % 2:
            s = xp.concatenate([s, _take(a, n - 1, n, ax)], axis=ax)
        a = s
    sl = [slice(None)] * a.ndim
    sl[ax] = 0
    return a[tuple(sl)]


# ---------------------------------------------------------------------------
# host <-> digit conversions (exact, via Python ints)
# ---------------------------------------------------------------------------

def ints_to_digits(values, w) -> np.ndarray:
    """Python ints (non-negative, < 2^(16w)) -> uint32 [w, N] digit planes."""
    n = len(values)
    buf = bytearray(2 * w * n)
    nb = 2 * w
    for i, v in enumerate(values):
        buf[i * nb:(i + 1) * nb] = int(v).to_bytes(nb, "little")
    u16 = np.frombuffer(bytes(buf), dtype="<u2").reshape(n, w)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def digits_to_ints(digits: np.ndarray) -> list[int]:
    """uint32 [w, N] digit planes -> list of Python ints."""
    d = np.asarray(digits)
    w = d.shape[0]
    flat = d.reshape(w, -1)
    u16 = np.ascontiguousarray(flat.T.astype("<u2"))
    raw = u16.tobytes()
    nb = 2 * w
    return [int.from_bytes(raw[i * nb:(i + 1) * nb], "little")
            for i in range(u16.shape[0])]
