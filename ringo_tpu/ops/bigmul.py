"""Wide modular multiplication for device big-field arithmetic.

The CIOS Montgomery kernel (fields/limb.mont_mul) has an O(w^2) unrolled
graph with sequential carry chains — fine for w <= 16, but the 880-bit field
has w = 55 digits and the unrolled HLO breaks the TPU compiler.  This module
multiplies in **plain** (non-Montgomery) representation instead:

1. schoolbook convolution of 16-bit digit columns with *lazy* carries:
   column sums stay < 2*w*2^16 < 2^23 for w <= 64, so no carry propagates
   until one final ripple (a lax.scan);
2. Barrett reduction with a precomputed mu = floor(B^(2w)/p): two more
   convolutions and two conditional subtractions — no data-dependent loops.

Everything is elementwise over trailing axes and exact; the graph is O(w)
via lax.scan over the convolution shifts (numpy path loops in Python).
Reference counterpart: the generated CIOS assembly (element.go:481-600) —
same math, carry-free dataflow for the VPU.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import limb
from ..fields.spec import DIGIT_BITS, DIGIT_MASK, FieldSpec

try:
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None


class BarrettSpec:
    """Precomputed constants for plain-representation arithmetic mod p."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.w = spec.w
        B = 1 << DIGIT_BITS
        self.mu_digits = _digits(spec.p and (B ** (2 * self.w)) // spec.p,
                                 self.w + 2)
        self.p_digits = _digits(spec.p, self.w)
        self.p_ext = _digits(spec.p, self.w + 2)


def _digits(x: int, w: int) -> np.ndarray:
    return np.array([(x >> (DIGIT_BITS * j)) & DIGIT_MASK for j in range(w)],
                    dtype=np.uint32)


def conv_columns(x, y, xp):
    """Digit convolution with lazy carries: x [wx, ...], y [wy, ...] u32
    16-bit planes -> column sums [wx+wy, ...] u32 (each < 2^23 for
    wx, wy <= 64), NOT carry-normalized."""
    wx, wy = x.shape[0], y.shape[0]
    mask = xp.uint32(DIGIT_MASK)
    out_w = wx + wy
    if xp is np:
        cols = np.zeros((out_w,) + tuple(np.broadcast_shapes(
            x.shape[1:], y.shape[1:])), dtype=np.uint32)
        for a in range(wx):
            t = x[a] * y  # [wy, ...] u32 full products
            cols[a:a + wy] += t & mask
            cols[a + 1:a + wy + 1] += t >> np.uint32(DIGIT_BITS)
        return cols
    shape = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
    cols0 = jnp.zeros((out_w,) + shape, dtype=jnp.uint32)

    def body(cols, xa_a):
        xa, a = xa_a
        t = xa * y  # [wy, ...]
        lo = jnp.concatenate([t & mask, jnp.zeros((1,) + shape, jnp.uint32)])
        hi = jnp.concatenate([jnp.zeros((1,) + shape, jnp.uint32),
                              t >> jnp.uint32(DIGIT_BITS)])
        upd = lo + hi  # [wy+1, ...]
        cur = jax.lax.dynamic_slice_in_dim(cols, a, wy + 1, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(cols, cur + upd, a, axis=0)
        return cols, None

    cols, _ = jax.lax.scan(body, cols0,
                           (x, jnp.arange(wx, dtype=jnp.int32)))
    return cols


def ripple(cols, xp, out_w=None):
    """Carry-normalize column sums -> 16-bit digits [out_w, ...]."""
    w = cols.shape[0] if out_w is None else out_w
    mask = xp.uint32(DIGIT_MASK)
    if xp is np:
        out = np.zeros((w,) + cols.shape[1:], dtype=np.uint32)
        c = np.zeros(cols.shape[1:], dtype=np.uint32)
        for j in range(w):
            s = (cols[j] if j < cols.shape[0] else 0) + c
            out[j] = s & mask
            c = s >> np.uint32(DIGIT_BITS)
        return out

    def body(c, col):
        s = col + c
        return s >> jnp.uint32(DIGIT_BITS), s & mask

    pad = w - cols.shape[0]
    if pad > 0:
        cols = jnp.concatenate(
            [cols, jnp.zeros((pad,) + cols.shape[1:], jnp.uint32)])
    _, out = jax.lax.scan(body, jnp.zeros(cols.shape[1:], jnp.uint32),
                          cols[:w])
    return out


def _shift_digits(z, k):
    """Drop the k least-significant digit planes (floor divide by B^k)."""
    return z[k:]


def _cond_sub(a, b_digits, xp):
    """a - b if a >= b else a, digitwise planes (same length)."""
    diff, borrow = limb._sub_borrow(xp, limb._unstack(a),
                                    limb._unstack(a * 0 + b_digits))
    diff = xp.stack(diff, axis=0)
    return xp.where(borrow != 0, a, diff)


class BigMul:
    """Plain-representation modular ops for one field, device-friendly."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.w = spec.w
        self.bar = BarrettSpec(spec)

    def mul_mod(self, x, y):
        """(x * y) mod p for plain digit planes [w, ...]."""
        xp = limb.get_xp(x, y)
        z_cols = conv_columns(x, y, xp)              # [2w, ...]
        return self._barrett(z_cols, xp)

    def reduce_cols(self, cols):
        """Lazy column sums [m, ...] u32 (base-2^16 positional, each column
        < 2^23) of a value z < 2^16 * p^2 -> z mod p digit planes [w, ...].

        Used by ops/biglinmap for matmul-accumulated inner products
        y_i = sum_j W[i,j] * x[j] (< ni * p^2 with ni <= 2^16), which exceed
        the plain Barrett range z < B^(2w): the high digits above B^(2w-1)
        (a value < 2^32 since z < 2^16 * B^(2w)) are folded back with the
        precomputed constant B^(2w-1) mod p, leaving z' < 2*B^(2w-1) in
        Barrett range."""
        xp = limb.get_xp(cols)
        w = self.w
        s = 2 * w - 1
        z = ripple(cols, xp, cols.shape[0] + 1)
        if z.shape[0] > s:
            hi = z[s:]                              # value < 2^32: <= 3 digits
            if not hasattr(self, "_bs_digits"):
                B = 1 << DIGIT_BITS
                self._bs_digits = _digits(pow(B, s, self.spec.p), self.w)
            c = _bcast(xp, np.asarray(self._bs_digits).reshape(
                (self.w,) + (1,) * (z.ndim - 1)), hi)
            fold = conv_columns(hi, c, xp)          # [w + hi_w, ...]
            lo = z[:s]
            m = max(s, fold.shape[0])
            pad_lo = xp.concatenate(
                [lo, xp.zeros((m - s,) + lo.shape[1:], xp.uint32)]) \
                if m > s else lo
            pad_f = xp.concatenate(
                [fold, xp.zeros((m - fold.shape[0],) + fold.shape[1:],
                                xp.uint32)]) if m > fold.shape[0] else fold
            return self._barrett(pad_lo + pad_f, xp)
        return self._barrett(z, xp, rippled=True)

    def _barrett(self, z_cols, xp, rippled: bool = False):
        """Barrett-reduce column sums (or pre-rippled digits) of z < B^(2w)
        to z mod p."""
        w = self.w
        nd = z_cols.ndim
        z = z_cols if rippled else ripple(z_cols, xp, 2 * w + 1)  # [2w+1,...]
        if z.shape[0] < 2 * w + 1:
            z = xp.concatenate(
                [z, xp.zeros((2 * w + 1 - z.shape[0],) + z.shape[1:],
                             xp.uint32)])
        # Barrett (HAC 14.42): q_hat = floor(floor(z/B^(w-1)) * mu / B^(w+1))
        zh = _shift_digits(z, w - 1)                 # [w+2, ...]
        mu = np.asarray(self.bar.mu_digits).reshape(
            (self.w + 2,) + (1,) * (nd - 1))
        q_cols = conv_columns(zh, _bcast(xp, mu, zh), xp)
        q_full = ripple(q_cols, xp)                  # [2w+4, ...]
        q_hat = _shift_digits(q_full, w + 1)[:w + 1]  # [w+1, ...]
        # r = z - q_hat * p  (low w+2 digits suffice: r < 3p < B^(w+2))
        pd = np.asarray(self.bar.p_digits).reshape(
            (self.w,) + (1,) * (nd - 1))
        qp_cols = conv_columns(q_hat, _bcast(xp, pd, q_hat), xp)
        qp = ripple(qp_cols, xp, w + 2)
        r, _ = limb._sub_borrow(xp, limb._unstack(z[:w + 2]),
                                limb._unstack(qp))
        r = xp.stack(r, axis=0)
        p_ext = np.asarray(self.bar.p_ext).reshape(
            (self.w + 2,) + (1,) * (nd - 1))
        p_b = _bcast(xp, p_ext, r)
        r = _cond_sub(r, p_b, xp)
        r = _cond_sub(r, p_b, xp)
        return r[:w]


def _bcast(xp, const, like):
    return xp.asarray(const) + xp.zeros((1,) + like.shape[1:], dtype=xp.uint32)
