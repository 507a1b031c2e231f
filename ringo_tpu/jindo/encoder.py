"""Jindo encoder: the Z_p <-> R_q bridge (reference jindo/encoder.go).

Encodes batches of big-field value vectors into small-ring polynomials by
base-b digit decomposition with strided slot layout coeff[j*slots + i], and
the randomized variant adds p * (discrete Gaussian drift correction) so
commitments leak nothing about the encoded digits.

Everything is batch-first: one call encodes a whole [batch, slots] block of
values into [2, L, batch, d] ring polynomials, with the data-dependent
Gaussian sampling vectorized on host (numpy) and the digit decomposition /
embedding / NTT running through the limb kernels.
"""

from __future__ import annotations

import math

import numpy as np

from ..csprng import COSACSampler, TwinCDTGaussianSampler
from ..fields import limb
from ..rings.rns import RnsReconstructor
from .params import Parameters


def _delta_inv(params: Parameters) -> np.ndarray:
    """[-1/p, -b/p, ..., -b^(k-1)/p] as float64 with the reference's
    small-value flush to zero (encoder.go:50-67)."""
    spec = params.spec
    threshold = math.exp2(-50) / (float(spec.b) * float(spec.k))
    out = np.zeros(spec.k)
    num = -1  # running -b^i
    for i in range(spec.k):
        v = num / spec.p  # Python int ratio -> correctly rounded float64
        if abs(v) < threshold:
            v = 0.0
        out[i] = v
        num *= spec.b
    return out


class Encoder:
    def __init__(self, params: Parameters, seed: bytes | None = None):
        self.params = params
        self.spec = params.spec
        self.twin_cdt = TwinCDTGaussianSampler(
            params.ecd_std_dev, None if seed is None else seed + b"tc")
        self.cosac = COSACSampler(None if seed is None else seed + b"co")
        self.rns = RnsReconstructor(params.ring_q)
        self.delta_inv = _delta_inv(params)

    # -- digit decomposition -------------------------------------------------

    def base_digits(self, values) -> np.ndarray:
        """Plain digit planes [w, *batch, slots] -> base-b digit tensor
        [*batch, d] int64 laid out coeff[j*slots + i]
        (reference baseEncodeTo, encoder.go:120-146).  Traceable: runs on
        host numpy or inside jit.

        jax path for b < 2^21 (all reference moduli): 32-bit-chunk long
        division in f64 (cur = r*2^32 + chunk < b*2^32 < 2^53, exact) with
        a shrinking chunk count (the quotient loses log2(b) bits per
        extracted digit) — ~8x fewer f64 ops than the 16-bit digit ladder,
        which matters because TPU f64 is software-emulated."""
        p = self.params
        k, slots = p.exp, p.slots
        xp = limb.get_xp(values)
        if xp is not np and p.base < (1 << 21):
            return self._base_digits_chunked(values, xp)
        if xp is not np and k > 8:
            # scan over the k-1 division steps: the unrolled chain is
            # O(k*w) ops (k=64, w=55 for the 880-bit field — a compile
            # killer); the scanned graph is O(w)
            import jax

            def body(cur, _):
                cur2, r = limb.divmod_small(cur, p.base)
                return cur2, r.astype(xp.int64)

            cur, rs = jax.lax.scan(body, values, None, length=k - 1)
            last = cur[0].astype(xp.int64)
            if cur.shape[0] > 1:
                last = last + (cur[1].astype(xp.int64) << 16)
            d = xp.concatenate([xp.moveaxis(rs, 0, -2), last[..., None, :]],
                               axis=-2)  # [*batch, k, slots]
            return d.reshape(*d.shape[:-2], p.degree)
        cur = values
        digs = []
        for _ in range(k - 1):
            cur, r = limb.divmod_small(cur, p.base)
            digs.append(r.astype(xp.int64))
        # final quotient <= b (can exceed one 16-bit digit, so combine two)
        last = cur[0].astype(xp.int64)
        if cur.shape[0] > 1:
            last = last + (cur[1].astype(xp.int64) << 16)
        digs.append(last)
        d = xp.stack(digs, axis=-2)  # [*batch, k, slots]
        return d.reshape(*d.shape[:-2], p.degree)

    def _base_digits_chunked(self, values, xp) -> np.ndarray:
        """32-bit-chunk shrinking division ladder (jax, b < 2^21)."""
        p = self.params
        spec = self.spec
        k = p.exp
        b = float(p.base)
        inv_b = 1.0 / b
        w = values.shape[0]
        # 16-bit digit planes -> f64 32-bit chunks (exact ints < 2^32)
        W2 = -(-w // 2)
        chunks = []
        for j in range(W2):
            lo = values[2 * j].astype(xp.float64)
            if 2 * j + 1 < w:
                lo = lo + values[2 * j + 1].astype(xp.float64) * 65536.0
            chunks.append(lo)
        # chunk count needed after i digit extractions: quotient <= b^(k-i)
        log2b = math.log2(p.base)
        digs = []
        for i in range(k - 1):
            need = max(1, -(-int((k - i) * log2b + 2) // 32))
            need = min(need, len(chunks))
            del chunks[need:]
            r = chunks[0] * 0.0
            for j in reversed(range(need)):
                cur = r * 4294967296.0 + chunks[j]  # < b*2^32 < 2^53, exact
                q = xp.floor(cur * inv_b)
                r = cur - q * b                     # exact: both < 2^53
                q = xp.where(r < 0, q - 1.0, q)
                r = xp.where(r < 0, r + b, r)
                q = xp.where(r >= b, q + 1.0, q)
                r = xp.where(r >= b, r - b, r)
                chunks[j] = q
            digs.append(r.astype(xp.int64))
        last = chunks[0]
        for j in range(1, len(chunks)):
            last = last + chunks[j] * float(1 << (32 * j))
        digs.append(last.astype(xp.int64))
        d = xp.stack(digs, axis=-2)  # [*batch, k, slots]
        return d.reshape(*d.shape[:-2], p.degree)

    def drift_centers(self, coeffs) -> np.ndarray:
        """Gaussian drift centers -fp for randomized encoding
        (encoder.go:152-164).  coeffs [*batch, d] int64; returns float64
        centers of the drift-correction Gaussians.  Traceable."""
        p = self.params
        d, slots, k = p.degree, p.slots, p.exp
        xp = limb.get_xp(coeffs)
        c0 = coeffs.astype(xp.float64)
        fp = xp.zeros(coeffs.shape, dtype=xp.float64)
        for i in range(k):
            di = self.delta_inv[i]
            if di == 0.0:
                continue
            dd = d - (i + 1) * slots
            # fp[..., dd:] += di*c0[..., :d-dd]; fp[..., :dd] -= di*c0[..., d-dd:]
            fp = fp + xp.concatenate(
                [-di * c0[..., d - dd:], di * c0[..., :d - dd]], axis=-1)
        return -fp

    def correction_total(self, coeffs, c):
        """total = coeffs + (X^slots - b) * c — the drift correction that
        preserves the decoded value exactly (encoder.go:186-196).  Traceable;
        coeffs/c [*batch, d] int64."""
        p = self.params
        d, slots = p.degree, p.slots
        xp = limb.get_xp(coeffs, c)
        shifted = xp.concatenate([-c[..., d - slots:], c[..., :d - slots]],
                                 axis=-1)
        return coeffs + shifted - int(p.base) * c

    # -- plain encode ---------------------------------------------------------

    def encode(self, values) -> np.ndarray:
        """Plain digit planes [w, *batch, slots] -> MForm+NTT ring polys
        [2, L, *batch, d] (reference encodeTo, encoder.go:113-117)."""
        ring = self.params.ring_q
        coeffs = self.base_digits(values)
        poly = ring.embed_int64(coeffs)
        return ring.ntt(ring.mform(poly))

    def encode_scalars(self, ints: list[int]) -> np.ndarray:
        """Host ints -> one single-slot encode each: [2, L, len, d]."""
        p = self.params
        vals = np.zeros((self.spec.w, len(ints), p.slots), dtype=np.uint32)
        vd = limb.ints_to_digits([v % self.spec.p for v in ints], self.spec.w)
        vals[:, :, 0] = vd
        return self.encode(vals)

    # -- randomized encode ----------------------------------------------------

    def rand_encode(self, values, std_dev: np.ndarray | float) -> np.ndarray:
        """Randomized encode: host coefficients + device embed/MForm/NTT."""
        ring = self.params.ring_q
        total = self.rand_encode_coeffs(values, std_dev)
        return ring.ntt(ring.mform(ring.embed_int64(total)))

    def rand_encode_coeffs(self, values, std_dev: np.ndarray | float) -> np.ndarray:
        """Host part of randomized encoding (reference randEncodeTo,
        encoder.go:149-201): base-b digits plus the p-multiple Gaussian drift
        correction, as signed int64 coefficients [batch, d].

        std_dev: scalar or [batch] array; entries equal to ecd_std_dev use the
        Twin-CDT sampler, others COSAC."""
        p = self.params
        d, slots, k = p.degree, p.slots, p.exp
        coeffs = self.base_digits(values)  # [batch, d] int64
        batch = coeffs.shape[0]
        centers = self.drift_centers(coeffs).reshape(-1)
        sd = np.broadcast_to(np.asarray(std_dev, dtype=np.float64), (batch,))
        use_twin = np.isclose(sd, p.ecd_std_dev, rtol=0, atol=0) | (sd == p.ecd_std_dev)
        use_twin = np.repeat(use_twin, d)
        c = np.empty(batch * d, dtype=np.int64)
        if use_twin.any():
            c[use_twin] = self.twin_cdt.sample(centers[use_twin])
        if (~use_twin).any():
            sd_full = np.repeat(sd, d)
            c[~use_twin] = self.cosac.sample(centers[~use_twin], sd_full[~use_twin])
        c = c.reshape(batch, d)
        return self.correction_total(coeffs, c)

    # -- decode ----------------------------------------------------------------

    def decode(self, poly) -> list[int]:
        """Plain coeff-domain poly [2, L, d] -> slots field values
        (reference DecodeTo, encoder.go:204-219)."""
        p = self.params
        coeffs = self.rns.reconstruct(poly)  # balanced ints, length d
        out = []
        for i in range(p.slots):
            acc = 0
            for j in reversed(range(p.exp)):
                acc = (acc * p.base + coeffs[j * p.slots + i]) % self.spec.p
            out.append(acc)
        return out
