"""Device-side exact CRT reconstruction + arithmetic shift + re-embedding.

This is the cutoff/rounding step of Jindo commitments (reference
jindo/prover.go:159-176, 186-201: INTT -> big-int CRT -> Rsh -> re-embed),
done entirely in 16-bit digit planes so it runs inside jit/shard_map instead
of a host big-int loop.  Exact fast base conversion:

1. y_l = r_l * t_l mod q_l with t_l = (Q/q_l)^{-1} mod q_l — a per-plane
   Montgomery mul, so the unreduced CRT sum acc = sum_l y_l * (Q/q_l) is
   already < L*Q (not L*2^30*Q), leaving only ceil(log2 L) conditional
   subtractions of Q*2^j instead of a ~35-step ladder;
2. the digit products y_l * (Q/q_l) are one broadcast multiply [2, L, W]
   summed over planes with a single carry ripple (every column < 2^21,
   exact in uint32);
3. balanced value v in [-Q/2, Q/2) floor-shifted by ``shift`` bits
   (negative branch via -ceil((Q - acc) / 2^shift));
4. residues of |v| mod each destination prime via a lax.scan over
   Montgomery-folded powers of 2^16, then sign fix-up.

Sequential chains (the subtraction ladder, the digit-fold scan) are
``lax.scan``s under jax: XLA:CPU's LLVM pipeline degenerates on long unrolled
uint32 dependency chains (hours of compile time for the unrolled form), and
the loops are data-sequential anyway.  Everything is elementwise over the
coefficient axes and exact — bit-identical to the host big-int path (tested
against RnsReconstructor in tests/test_ntt.py).
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import DIGIT_BITS, DIGIT_MASK
from .rns import RnsRing

try:
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None


def _digits_of(x: int, w: int) -> np.ndarray:
    return np.array([(x >> (DIGIT_BITS * j)) & DIGIT_MASK for j in range(w)],
                    dtype=np.uint32)


def _scan_or_loop(xp, body, init, xs_arrays):
    """fori-style accumulation: numpy loops, jax lax.scan (O(1) HLO)."""
    if xp is np:
        carry = init
        for i in range(xs_arrays[0].shape[0]):
            carry = body(carry, tuple(a[i] for a in xs_arrays))
        return carry
    carry, _ = jax.lax.scan(lambda c, x: (body(c, x), None), init, xs_arrays)
    return carry


def norm_cols_to_int(cols) -> int:
    """Host combine of ``CrtShiftEmbed.norm_sq_cols`` output."""
    return sum(int(c) << (16 * k) for k, c in enumerate(np.asarray(cols)))


class CrtShiftEmbed:
    """Precomputed tables for ring_src -> (balanced >> shift) -> ring_dst."""

    def __init__(self, ring_src: RnsRing, ring_dst: RnsRing, shift: int):
        self.src = ring_src
        self.dst = ring_dst
        self.shift = shift
        Q = ring_src.modulus
        self.Q = Q
        L = ring_src.L
        self.base_w = -(-Q.bit_length() // DIGIT_BITS)
        self.W = self.base_w + 1  # acc < L*Q needs log2(L) extra bits only

        W = self.W
        R2 = 1 << (DIGIT_BITS * 2)
        # t_l = (Q/q_l)^{-1} mod q_l in Montgomery form, per plane [2, L]
        tm = np.zeros((2, L), dtype=np.uint32)
        G = np.zeros((L, W), dtype=np.uint32)  # Q/q_l digits
        for i, p in enumerate(ring_src.primes):
            qdiv = Q // p
            t = pow(qdiv % p, -1, p)
            tm[:, i] = limb.ints_to_digits([t * R2 % p], 2)[:, 0]
            G[i] = _digits_of(qdiv, W)
        self.t_mont = tm
        self.G = G
        # conditional-subtraction ladder Q * 2^j, descending: acc < L*Q
        self.n_red = max(1, (L - 1).bit_length())
        self.q_ladder = np.stack(
            [_digits_of(Q << j, W) for j in range(self.n_red - 1, -1, -1)])
        self.q_digits = _digits_of(Q, W)
        self.q_half = _digits_of(Q >> 1, W)
        self.shift_bias = _digits_of((1 << shift) - 1, W)
        # destination powers 2^(16*i) in Montgomery form, scan-ordered [W, 2, LO]
        LO = ring_dst.L
        pw = np.zeros((W, 2, LO), dtype=np.uint32)
        for jj, q in enumerate(ring_dst.primes):
            for i in range(W):
                v = (1 << (DIGIT_BITS * i)) % q * R2 % q
                pw[i, 0, jj] = v & DIGIT_MASK
                pw[i, 1, jj] = (v >> DIGIT_BITS) & DIGIT_MASK
        self.pw16 = pw

    def balanced_mag(self, poly):
        """poly: plain coeff-domain [2, L, *lead] over ring_src.
        Returns (mag, is_neg): the balanced value v in [-Q/2, Q/2) as
        |v| >> shift in 16-bit digit planes mag [W, *lead] u32 plus its
        sign — steps 1-4 of the full conversion (exact)."""
        xp = limb.get_xp(poly)
        L = self.src.L
        W = self.W
        mask = xp.uint32(DIGIT_MASK)
        lead = poly.shape[2:]
        nl = len(lead)

        # 1) y_l = r_l * t_l mod q_l (per-plane Montgomery mul, exact)
        tmb = self.t_mont.reshape(2, L, *([1] * nl))
        qsrc = np.asarray(self.src.qd).reshape(2, L, *([1] * nl))
        qinv_src = np.asarray(self.src.qinv16).reshape(L, *([1] * nl))
        y = limb.mont_mul(poly, tmb, qsrc, qinv_src)  # [2, L, *lead]

        # 2) acc = sum_l y_l * (Q/q_l): broadcast products, split lo/hi,
        # plane-sum, then align into digit columns and ripple carries once.
        Gb = self.G.T.reshape(W, 1, L, *([1] * nl))       # [W, 1, L, ...]
        t = y[None, ...] * Gb                             # [W, 2, L, *lead]
        lo = (t & mask).sum(axis=2, dtype=xp.uint32)      # [W, 2, *lead]
        hi = (t >> xp.uint32(DIGIT_BITS)).sum(axis=2, dtype=xp.uint32)
        # col_j = lo[j,0] + lo[j-1,1] + hi[j-1,0] + hi[j-2,1]  (y digit k and
        # product half h land in column j+k+h); bounds: < 4L*2^16 < 2^21.
        zero1 = xp.zeros_like(lo[:1, 0])
        cols = (xp.concatenate([lo[:, 0], zero1, zero1], axis=0)
                + xp.concatenate([zero1, lo[:, 1] + hi[:, 0], zero1], axis=0)
                + xp.concatenate([zero1, zero1, hi[:, 1]], axis=0))  # [W+2,...]
        # single carry ripple (scan over digits; carry < 2^6)
        def ripple(carry, col):
            s = col + carry
            return s >> xp.uint32(DIGIT_BITS), s & mask
        if xp is np:
            digs = []
            c = xp.zeros_like(cols[0])
            for m in range(W):
                c, d = ripple(c, cols[m])
                digs.append(d)
            dig = np.stack(digs, axis=0)
        else:
            _, dig = jax.lax.scan(lambda c, col: ripple(c, col),
                                  jnp.zeros_like(cols[0]), cols[:W])
        # acc < L*Q fits W digits (cols beyond W are zero after carries:
        # the true value is < L*Q < 2^(16W))

        # 3) exact reduction mod Q by the short ladder (scan)
        def ladder_step(dig, xs):
            (qj,) = xs
            qjb = qj.reshape(W, *([1] * nl)) + xp.zeros_like(dig)
            diff, borrow = limb._sub_borrow(xp, limb._unstack(dig),
                                            limb._unstack(qjb))
            diff = xp.stack(diff, axis=0)
            return xp.where(borrow != 0, dig, diff)
        dig = _scan_or_loop(xp, ladder_step, dig, (self.q_ladder,))

        # 4) balanced shift
        q_half = self.q_half.reshape(W, *([1] * nl))
        is_neg = limb.geq(dig, dig * 0 + q_half)
        qd = self.q_digits.reshape(W, *([1] * nl))
        u_neg, _ = limb._sub_borrow(xp, limb._unstack(dig * 0 + qd),
                                    limb._unstack(dig))
        u_neg = xp.stack(u_neg, axis=0)
        bias = self.shift_bias.reshape(W, *([1] * nl))
        u_neg_b, _ = limb._add_carry(xp, limb._unstack(u_neg),
                                     limb._unstack(u_neg * 0 + bias))
        u_neg = xp.stack(u_neg_b, axis=0)
        mag = xp.where(is_neg[None, ...], u_neg, dig)
        return self._shift_right(xp, mag), is_neg

    def __call__(self, poly):
        """poly: plain coeff-domain [2, L, *lead] over ring_src.
        Returns plain residues over ring_dst [2, LO, *lead]."""
        xp = limb.get_xp(poly)
        W = self.W
        lead = poly.shape[2:]
        nl = len(lead)
        mag, is_neg = self.balanced_mag(poly)

        # 5) embed |v| mod each destination prime (scan over value digits),
        # then fix signs
        LO = self.dst.L
        qdst = np.asarray(self.dst.qd).reshape(2, LO, *([1] * nl))
        qinv = np.asarray(self.dst.qinv16).reshape(LO, *([1] * nl))

        def embed_step(acc, mag_pw):
            mag_i, pw_i = mag_pw  # mag_i [*lead]; pw_i [2, LO]
            di = xp.stack([mag_i, mag_i * xp.uint32(0)], axis=0)  # [2, *lead]
            pwb = pw_i.reshape(2, LO, *([1] * nl))
            term = limb.mont_mul(di[:, None, ...], pwb, qdst, qinv)
            return limb.add(acc, term, qdst)

        acc0 = xp.zeros((2, LO, *lead), dtype=xp.uint32)
        acc = _scan_or_loop(xp, embed_step, acc0,
                            (mag, np.asarray(self.pw16)))
        neg_acc = limb.neg(acc, qdst)
        return xp.where(is_neg[None, None, ...], neg_acc, acc)

    def norm_sq_cols(self, polys):
        """Exact sum of squared balanced coefficients over ``polys`` (each
        plain coeff-domain [2, L, *lead] over ring_src), as 16-bit-weighted
        u64 columns: the integer is sum_k cols[k] * 2^(16k) (combine with
        ``norm_cols_to_int`` on host).  Device analogue of the verifier's
        exact l2 norm (reference jindo/verifier.go:262-282): |v|^2 drops
        the sign, so only the balanced magnitude digits are needed; digit
        products < 2^32 summed over < 2^21 coefficients and W <= 8 planes
        stay < 2^56 — exact in uint64."""
        xp = limb.get_xp(polys[0])
        W = self.W
        acc = None
        for poly in polys:
            mag, _ = self.balanced_mag(poly)
            m = mag.reshape(W, -1).astype(xp.uint64)
            g = (m[:, None, :] * m[None, :, :]).sum(axis=2)  # [W, W] u64
            acc = g if acc is None else acc + g
        cols = [None] * (2 * W - 1)
        for i in range(W):
            for j in range(W):
                k = i + j
                cols[k] = acc[i, j] if cols[k] is None else cols[k] + acc[i, j]
        return xp.stack(cols)

    def _shift_right(self, xp, dig):
        """Right-shift a [W, *lead] digit array by self.shift bits."""
        W = self.W
        mask = xp.uint32(DIGIT_MASK)
        ds, b = divmod(self.shift, DIGIT_BITS)
        zero = dig[0] * xp.uint32(0)
        out = []
        for j in range(W):
            lo = dig[j + ds] if j + ds < W else zero
            if b == 0:
                out.append(lo)
            else:
                hi = dig[j + ds + 1] if j + ds + 1 < W else zero
                out.append(((lo >> xp.uint32(b))
                            | ((hi << xp.uint32(DIGIT_BITS - b)) & mask)) & mask)
        return xp.stack(out, axis=0)
