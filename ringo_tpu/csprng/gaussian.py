"""Vectorized Gaussian samplers, distribution-identical to the reference
(math/csprng/gaussian_{rounded,twin_cdt,cosac}.go).

The reference samples one value at a time with data-dependent rejection; on
TPU hosts sampling must be array-at-a-time, so every sampler here draws
candidate blocks and compacts accepted values.  The underlying decision rules
(Ziggurat tables including the reference's fn[0]=0 quirk, Twin-CDT tables and
the disagreement CDF walk, COSAC's accept tests) are reproduced exactly, so
each output value has the same distribution as the Go scalar loop.
"""

from __future__ import annotations

import math

import numpy as np

from .uniform import UniformSampler

BLOCK_SIZE = 128
FLOAT_PREC = 52
TWIN_CDT_TAIL_CUT = 9
RN = 3.442619855899  # Marsaglia-Tsang (2000)


def _normal(x):
    return np.exp(-0.5 * x * x)


def _normal_integral(x):
    return math.sqrt(math.pi / 2) * math.erfc(x / math.sqrt(2))


def _ziggurat_tables():
    v = RN * math.exp(-0.5 * RN * RN) + _normal_integral(RN)
    xn = np.zeros(BLOCK_SIZE)
    xn[BLOCK_SIZE - 1] = RN
    for i in range(BLOCK_SIZE - 2, 0, -1):
        xn[i] = math.sqrt(-2 * math.log(v / xn[i + 1] + math.exp(-0.5 * xn[i + 1] ** 2)))
    scale = float(1 << FLOAT_PREC)
    kn = np.zeros(BLOCK_SIZE, dtype=np.uint64)
    wn = np.zeros(BLOCK_SIZE)
    fn = np.zeros(BLOCK_SIZE)  # fn[0] stays 0 — reference leaves it unset
    for i in range(1, BLOCK_SIZE):
        kn[i] = np.uint64(int((xn[i - 1] / xn[i]) * scale))
        wn[i] = xn[i] / scale
        fn[i] = math.exp(-0.5 * xn[i] ** 2)
    kn[0] = np.uint64(int((RN * math.exp(-0.5 * RN * RN) / v) * scale))
    wn[0] = (v / math.exp(-0.5 * RN * RN)) / scale
    return kn, wn, fn


_KN, _WN, _FN = _ziggurat_tables()


class RoundedGaussianSampler:
    """Ziggurat normal sampler + rounding (reference gaussian_rounded.go)."""

    def __init__(self, seed: bytes | None = None):
        self.base = UniformSampler(seed)

    def norm_float(self, count: int) -> np.ndarray:
        out = np.empty(count)
        filled = 0
        while filled < count:
            need = count - filled
            r = self.base.sample_u64(need)
            b = (r >> np.uint64(63)).astype(np.int64)
            i = (r % np.uint64(BLOCK_SIZE)).astype(np.int64)
            j = ((r >> np.uint64(7)) % np.uint64(1 << FLOAT_PREC))
            mag = j.astype(np.float64)
            x = np.where(b == 1, -mag, mag) * _WN[i]
            accept = j < _KN[i]
            # wedge test for non-accepted, i > 0
            wedge = (~accept) & (i > 0)
            if wedge.any():
                u = self.base.sample_float(int(wedge.sum()))
                f0 = _FN[i[wedge] - 1]
                f1 = _FN[i[wedge]]
                ok = u * (f0 - f1) < _normal(x[wedge]) - f1
                w_acc = np.zeros(len(r), dtype=bool)
                w_acc[np.nonzero(wedge)[0][ok]] = True
                accept = accept | w_acc
            # tail algorithm for i == 0 non-accepted
            tail = (~accept) & (i == 0)
            if tail.any():
                nt = int(tail.sum())
                tu = np.empty(nt)
                pend = np.arange(nt)
                while len(pend):
                    uu = -np.log(self.base.sample_float(len(pend))) * (1.0 / RN)
                    vv = -np.log(self.base.sample_float(len(pend)))
                    ok = vv + vv >= uu * uu
                    tu[pend[ok]] = uu[ok]
                    pend = pend[~ok]
                tu += RN
                tx = np.where(b[tail] == 1, -tu, tu)
                x = x.copy()
                x[np.nonzero(tail)[0]] = tx
                accept = accept | tail
            good = np.nonzero(accept)[0]
            take = min(len(good), need)
            out[filled:filled + take] = x[good[:take]]
            filled += take
        return out

    def sample(self, center, std_dev, count: int = 1) -> np.ndarray:
        if np.any(np.asarray(std_dev) <= 0):
            raise ValueError("standard deviation not positive")
        return np.round(np.asarray(center) + self.norm_float(count) * std_dev).astype(np.int64)


def compute_cdt(center: float, sigma: float) -> np.ndarray:
    """Cumulative distribution table (reference computeCDT,
    gaussian_twin_cdt.go:13-33)."""
    tail_hi = int(math.ceil(TWIN_CDT_TAIL_CUT * sigma))
    tail_lo = -tail_hi
    size = tail_hi - tail_lo + 1
    table = np.zeros(size, dtype=np.uint64)
    cdf = 0.0
    norm = math.sqrt(2 * math.pi) * sigma
    for idx, x in enumerate(range(tail_lo, tail_hi + 1)):
        rho = math.exp(-(x - center) ** 2 / (2 * sigma * sigma)) / norm
        cdf += rho
        if cdf > 1:
            table[idx] = np.uint64(0xFFFFFFFFFFFFFFFF)
        else:
            table[idx] = np.uint64(min(int(round(cdf * 2.0 ** 64)), (1 << 64) - 1))
    return table


class TwinCDTGaussianSampler:
    """Twin-CDT discrete Gaussian: variable center, fixed sigma
    (reference gaussian_twin_cdt.go)."""

    def __init__(self, std_dev: float, seed: bytes | None = None):
        self.base = UniformSampler(seed)
        self.std_dev = float(std_dev)
        self.tables = np.stack(
            [compute_cdt(i / BLOCK_SIZE, std_dev) for i in range(BLOCK_SIZE)])
        self.tail_hi = int(math.ceil(TWIN_CDT_TAIL_CUT * std_dev))
        self.tail_lo = -self.tail_hi

    def sample(self, center, count: int | None = None) -> np.ndarray:
        c = np.atleast_1d(np.asarray(center, dtype=np.float64))
        if count is not None and len(c) == 1:
            c = np.broadcast_to(c, (count,)).copy()
        n = len(c)
        c_floor = np.floor(c)
        c_frac = c - c_floor
        c0 = (np.floor(BLOCK_SIZE * c_frac).astype(np.int64)) % BLOCK_SIZE
        c1 = (np.ceil(BLOCK_SIZE * c_frac).astype(np.int64)) % BLOCK_SIZE
        u = self.base.sample_u64(n)
        out = np.empty(n, dtype=np.int64)
        v0 = self._bsearch(c0, u)
        v1 = self._bsearch(c1, u) if not (c0 == c1).all() else v0
        agree = v0 == v1
        out[agree] = v0[agree] + c_floor[agree].astype(np.int64) + self.tail_lo
        bad = np.nonzero(~agree)[0]
        if len(bad):
            # disagreement: exact CDF walk (reference Sample slow path).
            # The reference sums x from tailLo up to the table *index* v0
            # (gaussian_twin_cdt.go:99-104), so the x range must reach the
            # max index value 2*tailHi.
            xs = np.arange(self.tail_lo, 2 * self.tail_hi + 1, dtype=np.float64)
            norm = math.sqrt(2 * math.pi) * self.std_dev
            rho = np.exp(-(xs[None, :] - c_frac[bad][:, None]) ** 2
                         / (2 * self.std_dev ** 2)) / norm
            cdf_cum = np.cumsum(rho, axis=1)
            idx = np.clip(v0[bad] - self.tail_lo, 0, len(xs) - 1)
            cdf_at_v0 = cdf_cum[np.arange(len(bad)), idx.astype(np.int64)]
            # Go walks x from tailLo to v0 inclusive where v0 is an index
            # offset; reference: for x := tailLo; x <= int64(v0); x++ —
            # i.e. cumulative over (v0 - tailLo + 1) entries ... but v0 there
            # is the table *index*, so entries [0 .. v0] — matches idx above
            # only when v0 is interpreted as index; replicate that:
            p = u[bad].astype(np.float64) / 2.0 ** 64
            pick0 = p < cdf_at_v0
            res = np.where(pick0, v0[bad], v1[bad])
            out[bad] = res + self.tail_lo + c_floor[bad].astype(np.int64)
        return out

    def _bsearch(self, cc: np.ndarray, u: np.ndarray) -> np.ndarray:
        """Per-table binary search (Go slices.BinarySearch semantics with the
        found -> v-1 adjustment), grouped by table index so each group is one
        C-level searchsorted."""
        n = len(cc)
        tbl_len = self.tables.shape[1]
        v = np.empty(n, dtype=np.int64)
        uniq = np.unique(cc)
        if len(uniq) == 1:
            tbl = self.tables[uniq[0]]
            pos = np.searchsorted(tbl, u, side="left")
            eq = (pos < tbl_len) & (tbl[np.minimum(pos, tbl_len - 1)] == u)
            return pos - eq
        order = np.argsort(cc, kind="stable")
        cs = cc[order]
        us = u[order]
        bounds = np.searchsorted(cs, np.arange(BLOCK_SIZE + 1))
        for g in range(BLOCK_SIZE):
            s, e = bounds[g], bounds[g + 1]
            if s == e:
                continue
            tbl = self.tables[g]
            pos = np.searchsorted(tbl, us[s:e], side="left")
            eq = (pos < tbl_len) & (tbl[np.minimum(pos, tbl_len - 1)] == us[s:e])
            v[order[s:e]] = pos - eq
        return v

    def sample_coset(self, center) -> np.ndarray:
        c = np.asarray(center, dtype=np.float64)
        return c + self.sample(-c).astype(np.float64)


class COSACSampler:
    """COSAC discrete Gaussian: variable center *and* sigma
    (reference gaussian_cosac.go)."""

    def __init__(self, seed: bytes | None = None):
        self.base = UniformSampler(seed)
        self.rounded = RoundedGaussianSampler(seed if seed is None else seed + b"r")

    def sample(self, center, std_dev, count: int | None = None) -> np.ndarray:
        c = np.atleast_1d(np.asarray(center, dtype=np.float64))
        s = np.atleast_1d(np.asarray(std_dev, dtype=np.float64))
        if count is not None and len(c) == 1:
            c = np.broadcast_to(c, (count,)).copy()
        if len(s) == 1:
            s = np.broadcast_to(s, c.shape)
        n = len(c)
        c_int = np.round(c)
        c_frac = c_int - c
        r = self.base.sample_float(n)
        direct = r < np.exp(-(c_frac ** 2) / (2 * s ** 2)) / (np.sqrt(2 * math.pi) * s)
        out = np.empty(n, dtype=np.int64)
        out[direct] = c_int[direct].astype(np.int64)
        pend = np.nonzero(~direct)[0]
        while len(pend):
            m = len(pend)
            sf, cf = s[pend], c_frac[pend]
            y = sf * self.rounded.norm_float(m)
            b = self.base.sample_u64(m) & np.uint64(1)
            y_round = np.where(b == 0, np.round(y) - 1, np.round(y) + 1)
            cmp = np.where(b == 0, y_round <= 0.5, y_round >= -0.5)
            rr = self.base.sample_float(m)
            acc_p = np.exp(-((y_round + cf) ** 2 - y * y) / (2 * sf * sf))
            ok = cmp & (rr < acc_p)
            idx = pend[ok]
            out[idx] = (y_round[ok] + c_int[idx]).astype(np.int64)
            pend = pend[~ok]
        return out
