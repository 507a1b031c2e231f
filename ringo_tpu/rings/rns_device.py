"""Device-side exact CRT reconstruction + arithmetic shift + re-embedding.

This is the cutoff/rounding step of Jindo commitments (reference
jindo/prover.go:159-176, 186-201: INTT -> big-int CRT -> Rsh -> re-embed),
done entirely in 16-bit digit planes so it runs inside jit/shard_map instead
of a host big-int loop:

1. acc = sum_l r_l * gad_l via lazy column sums (every partial < 2^22, exact
   in uint32);
2. acc mod Q by a conditional-subtraction ladder of Q * 2^j
   (acc < L * 2^31 * Q, so ~35 steps reduce it exactly);
3. balanced value v in [-Q/2, Q/2) floor-shifted by ``shift`` bits
   (negative branch via -ceil((Q - acc) / 2^shift));
4. residues of |v| mod each destination prime via Montgomery-folded powers of
   2^16, then sign fix-up.

Everything is elementwise over the coefficient axes and exact — bit-identical
to the host big-int path (tested against RnsReconstructor).
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import DIGIT_BITS, DIGIT_MASK
from .rns import RnsRing


def _digits_of(x: int, w: int) -> np.ndarray:
    return np.array([(x >> (DIGIT_BITS * j)) & DIGIT_MASK for j in range(w)],
                    dtype=np.uint32)


class CrtShiftEmbed:
    """Precomputed tables for ring_src -> (balanced >> shift) -> ring_dst."""

    def __init__(self, ring_src: RnsRing, ring_dst: RnsRing, shift: int):
        self.src = ring_src
        self.dst = ring_dst
        self.shift = shift
        Q = ring_src.modulus
        self.Q = Q
        self.base_w = -(-Q.bit_length() // DIGIT_BITS)
        self.W = self.base_w + 3  # headroom for the pre-reduction value

        W = self.W
        gads = []
        for p in ring_src.primes:
            qdiv = Q // p
            gads.append(qdiv * pow(qdiv, -1, p) % Q)
        self.gad = np.stack([_digits_of(g, W) for g in gads])  # [L, W]
        # conditional-subtraction ladder Q * 2^j, descending
        self.n_red = len(ring_src.primes).bit_length() + 32
        self.q_ladder = np.stack(
            [_digits_of(Q << j, W) for j in range(self.n_red - 1, -1, -1)])
        self.q_digits = _digits_of(Q, W)
        self.q_half = _digits_of(Q >> 1, W)
        self.shift_bias = _digits_of((1 << shift) - 1, W)
        # destination powers 2^(16*i) in Montgomery form [2, LO, W]
        LO = ring_dst.L
        R = 1 << (DIGIT_BITS * 2)
        pw = np.zeros((2, LO, W), dtype=np.uint32)
        for jj, q in enumerate(ring_dst.primes):
            for i in range(W):
                v = (1 << (DIGIT_BITS * i)) % q * R % q
                pw[0, jj, i] = v & DIGIT_MASK
                pw[1, jj, i] = (v >> DIGIT_BITS) & DIGIT_MASK
        self.pw16 = pw

    def __call__(self, poly):
        """poly: plain coeff-domain [2, L, *lead] over ring_src.
        Returns plain residues over ring_dst [2, LO, *lead]."""
        xp = limb.get_xp(poly)
        L = self.src.L
        W = self.W
        mask = xp.uint32(DIGIT_MASK)
        lead = poly.shape[2:]
        nl = len(lead)

        # 1) lazy column sums of sum_l (r0 + 2^16 r1)_l * gad_l
        r0, r1 = poly[0], poly[1]  # [L, *lead]
        zero = (r0[0] * xp.uint32(0))
        cols = [zero] * (W + 2)
        for j in range(self.base_w):
            gj = self.gad[:, j].reshape(L, *([1] * nl))
            t0 = r0 * gj
            t1 = r1 * gj
            cols[j] = cols[j] + (t0 & mask).sum(axis=0).astype(xp.uint32)
            cols[j + 1] = (cols[j + 1]
                           + (t0 >> xp.uint32(DIGIT_BITS)).sum(axis=0).astype(xp.uint32)
                           + (t1 & mask).sum(axis=0).astype(xp.uint32))
            cols[j + 2] = cols[j + 2] + (t1 >> xp.uint32(DIGIT_BITS)).sum(axis=0).astype(xp.uint32)
        # single carry ripple (columns < 2^22, so carries settle in one pass)
        dig = []
        c = zero
        for m in range(W):
            s = cols[m] + c
            dig.append(s & mask)
            c = s >> xp.uint32(DIGIT_BITS)
        dig = xp.stack(dig, axis=0)  # [W, *lead]

        # 2) exact reduction mod Q by the ladder
        for j in range(self.n_red):
            qj = self.q_ladder[j].reshape(W, *([1] * nl))
            diff, borrow = limb._sub_borrow(xp, limb._unstack(dig),
                                            limb._unstack(dig * 0 + qj))
            keep = borrow != 0
            dig = xp.stack([xp.where(keep, d_old, d_new)
                            for d_old, d_new in zip(limb._unstack(dig), diff)],
                           axis=0)

        # 3) balanced shift
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
        mag = self._shift_right(xp, mag)

        # 4) embed |v| mod each destination prime, then fix signs
        LO = self.dst.L
        pw = self.pw16.reshape(2, LO, W, *([1] * nl))
        qdst = self.dst.qd.reshape(2, LO, *([1] * nl))
        qinv = self.dst.qinv16.reshape(LO, *([1] * nl))
        acc = None
        for i in range(W):
            di = mag[i][None, ...]  # value digit as residue low half
            term = xp.stack([di[0], di[0] * xp.uint32(0)], axis=0)
            term = limb.mont_mul(term[:, None, ...], pw[:, :, i], qdst, qinv)
            acc = term if acc is None else limb.add(acc, term, qdst)
        neg_acc = limb.neg(acc, qdst)
        return xp.where(is_neg[None, None, ...], neg_acc, acc)

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
