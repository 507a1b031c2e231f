"""Exact big-field linear maps as ONE int8 MXU matmul.

The Buckler prover's hot loop is big-field NTTs (reference
bigpoly/ntt.go:277-355 `nttInPlaceUnroll` over `E.Mul` CIOS ops): every
butterfly multiplies w-digit operands, and the device engine
(ops/bigntt.py) runs those digit convolutions as O(w)-step lax.scans on
the VPU.  For a FIXED matrix W of field elements (a DFT block, a twiddle
fold, any linear map), the whole map

    y[i] = sum_j W[i, j] * x[j]  mod p        (x, y in Z_p, p up to 880 bits)

can instead run as a single int8 matmul with exact integer semantics:

* operands re-digitized to base 2^8: x -> 2w byte planes, W entries ->
  2w byte digits;
* the byte convolution that multiplies digits is folded into a BANDED
  matrix M[(k, i), (b, j)] = Wbytes[k - b, i, j]: one dot_general computes
  every output byte-column k = a + b of every output element i jointly —
  the O(w^2) digit cross products land on the MXU, not the VPU;
* int8 is signed, so both sides are offset by -128 and the three
  correction terms (constant, row sums of W, windowed column sums of x)
  are added back — two are host-precomputed constants, the third is a
  cumulative sum over 2w lanes;
* exact int32 accumulation holds for 128^2 * 2w * ni < 2^31 (checked);
* the int32 byte-columns spread into bounded base-2^16 lazy columns and
  reduce mod p through ops/bigmul's Barrett path (reduce_cols), with the
  above-B^(2w) part folded by a precomputed B^(2w-1) mod p constant.

Bit-exact vs Python-int matrix application (tests/test_biglinmap.py).
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import DIGIT_BITS, FieldSpec
from .bigmul import BigMul


class BigLinMap:
    """One fixed [no, ni] matrix of Z_p elements, applied to the last axis
    of plain digit planes [w, *batch, ni] -> [w, *batch, no]."""

    def __init__(self, spec: FieldSpec, rows, big: BigMul | None = None):
        self.spec = spec
        self.big = big if big is not None else BigMul(spec)
        w = spec.w
        W = [[int(v) % spec.p for v in r] for r in rows]
        no, ni = len(W), len(W[0])
        self.no, self.ni = no, ni
        wb = 2 * w                      # byte digits per operand
        self.K_out = 2 * wb - 1         # output byte columns
        # exact-int32 accumulation and reduce_cols fold-range guards
        if 128 * 128 * wb * ni >= 1 << 31:
            raise ValueError(f"matmul accumulator overflow: ni={ni}, w={w}")
        if 255 * 255 * wb * ni >= 1 << 31:
            raise ValueError(f"column-sum overflow: ni={ni}, w={w}")
        if ni > 1 << 16:
            raise ValueError("ni > 2^16 exceeds the reduce_cols fold range")

        # byte digits Wb[a, i, j] in [0, 255]
        Wb = np.zeros((wb, no, ni), dtype=np.int32)
        for i in range(no):
            for j in range(ni):
                v = W[i][j]
                for a in range(wb):
                    Wb[a, i, j] = (v >> (8 * a)) & 0xFF
        Ws = Wb - 128                                      # [-128, 127]

        # banded matrix M[(k, i), (b, j)] = Ws[k - b, i, j] — registered so
        # jitted callers can pass it as an argument instead of a (~25 MB at
        # w=55, ni=32) inline HLO constant (ops/devconst.py)
        from . import devconst

        M = np.zeros((self.K_out, no, wb, ni), dtype=np.int8)
        for b in range(wb):
            M[b:b + wb, :, b, :] = Ws.astype(np.int8)
        self.M = devconst.register(self, "M",
                                   M.reshape(self.K_out * no, wb * ni))

        # constant correction: 128 * sum_{a+b=k} row_s[a, i] + 128^2 * ni * cnt[k]
        row_s = Ws.sum(axis=2, dtype=np.int64)             # [wb, no]
        const = np.zeros((self.K_out, no), dtype=np.int64)
        cnt = np.zeros(self.K_out, dtype=np.int64)
        for b in range(wb):
            const[b:b + wb] += 128 * row_s
            cnt[b:b + wb] += 1
        const += (128 * 128 * ni) * cnt[:, None]
        self.const = const.astype(np.int32)

        # x-dependent correction window: term3[k] = 128 * sum_{b=lo..hi} s_x[b]
        # with a = k - b required in [0, wb)
        ks = np.arange(self.K_out)
        self.win_lo = np.maximum(0, ks - wb + 1).astype(np.int32)
        self.win_hi = np.minimum(wb - 1, ks).astype(np.int32)
        self.wb = wb

    def apply(self, x):
        """x: plain digit planes [w, *batch, ni] u32 (canonical, < p).
        Returns [w, *batch, no] of (W @ x) mod p along the last axis."""
        xp = limb.get_xp(x)
        w, wb, ni, no, K_out = self.spec.w, self.wb, self.ni, self.no, self.K_out
        lead = x.shape[1:-1]
        X = x.reshape(w, -1, ni).astype(xp.uint32)         # [w, NB, ni]
        NB = X.shape[1]
        # byte planes [wb, NB, ni]: plane 2t = low byte of digit t
        bytes_ = xp.stack([X & xp.uint32(0xFF),
                           (X >> xp.uint32(8)) & xp.uint32(0xFF)],
                          axis=1).reshape(wb, NB, ni)
        xs = bytes_.astype(xp.int32) - 128

        if xp is np:
            Xf = np.moveaxis(xs, 1, 2).reshape(wb * ni, NB)
            T = self.M.astype(np.int64) @ Xf.astype(np.int64)
        else:
            import jax
            import jax.numpy as jnp
            from . import devconst
            Xf = jnp.moveaxis(xs.astype(jnp.int8), 1, 2).reshape(wb * ni, NB)
            T = jax.lax.dot_general(
                devconst.get(self, "M"), Xf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        T = T.reshape(K_out, no, NB)

        # windowed column-sum correction
        s_x = xs.sum(axis=2, dtype=xp.int32)               # [wb, NB]
        cs = xp.concatenate(
            [xp.zeros((1, NB), dtype=xp.int32), xp.cumsum(s_x, axis=0)])
        term3 = 128 * (cs[self.win_hi + 1] - cs[self.win_lo])   # [K_out, NB]

        C = (T + xp.asarray(self.const)[:, :, None]
             + term3[:, None, :]).astype(xp.uint32)        # exact, < 2^31

        # spread int32 byte columns into base-2^16 lazy columns
        z = xp.zeros((K_out + 3, no, NB), dtype=xp.uint32)
        pieces = [C & xp.uint32(0xFF),
                  (C >> xp.uint32(8)) & xp.uint32(0xFF),
                  (C >> xp.uint32(16)) & xp.uint32(0xFF),
                  C >> xp.uint32(24)]
        for sft, piece in enumerate(pieces):
            if xp is np:
                z[sft:sft + K_out] += piece
            else:
                z = z.at[sft:sft + K_out].add(piece)
        if z.shape[0] % 2:
            z = xp.concatenate(
                [z, xp.zeros((1, no, NB), dtype=xp.uint32)])
        cols16 = z[0::2] + (z[1::2] << xp.uint32(8))       # < 2^18

        out = self.big.reduce_cols(cols16)                 # [w, no, NB]
        out = xp.moveaxis(out, 1, 2)                       # [w, NB, no]
        return out.reshape((w,) + lead + (no,))
