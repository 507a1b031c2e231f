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


def twin_cdt_resolve(std_dev: float, tail_lo: int, tail_hi: int,
                     c_frac: np.ndarray, u: np.ndarray,
                     v0: np.ndarray, v1: np.ndarray) -> np.ndarray:
    """Exact resolution of twin-table disagreements (reference Sample slow
    path, gaussian_twin_cdt.go:94-110): CDF walk at the exact fractional
    center; returns the chosen table index per lane.

    The reference sums x from tailLo up to the table *index* v0
    (gaussian_twin_cdt.go:99-104), so the x range must reach the max index
    value 2*tailHi."""
    xs = np.arange(tail_lo, 2 * tail_hi + 1, dtype=np.float64)
    norm = math.sqrt(2 * math.pi) * std_dev
    rho = np.exp(-(xs[None, :] - c_frac[:, None]) ** 2
                 / (2 * std_dev ** 2)) / norm
    cdf_cum = np.cumsum(rho, axis=1)
    idx = np.clip(v0 - tail_lo, 0, len(xs) - 1)
    cdf_at_v0 = cdf_cum[np.arange(len(c_frac)), idx.astype(np.int64)]
    p = u.astype(np.float64) / 2.0 ** 64
    return np.where(p < cdf_at_v0, v0, v1)


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
            res = twin_cdt_resolve(self.std_dev, self.tail_lo, self.tail_hi,
                                   c_frac[bad], u[bad], v0[bad], v1[bad])
            out[bad] = res + self.tail_lo + c_floor[bad].astype(np.int64)
        return out

    def _bsearch(self, cc: np.ndarray, u: np.ndarray) -> np.ndarray:
        """Per-table binary search (Go slices.BinarySearch semantics with the
        found -> v-1 adjustment), vectorized across all lanes at once: each
        lane searches its own table row via log2(T) gather+compare steps
        (no sort needed, ~6x faster than sort-and-segment at 500k lanes)."""
        tbl_len = self.tables.shape[1]
        # searchsorted(side='left'): find lo = #entries < u ... with the Go
        # semantics: pos = first index with tbl[pos] >= u; found (==) -> pos-1.
        lo = np.zeros(len(cc), dtype=np.int64)          # invariant: tbl[lo-1] < u
        hi = np.full(len(cc), tbl_len, dtype=np.int64)  # invariant: tbl[hi] >= u
        steps = (tbl_len).bit_length()
        for _ in range(steps):
            mid = (lo + hi) >> 1
            less = self.tables[cc, np.minimum(mid, tbl_len - 1)] < u
            mid_ok = mid < hi
            lo = np.where(mid_ok & less, mid + 1, lo)
            hi = np.where(mid_ok & ~less, mid, hi)
        pos = lo
        eq = (pos < tbl_len) & (self.tables[cc, np.minimum(pos, tbl_len - 1)] == u)
        return pos - eq

    def sample_coset(self, center) -> np.ndarray:
        c = np.asarray(center, dtype=np.float64)
        return c + self.sample(-c).astype(np.float64)


class TwinCDTDevice:
    """Twin-CDT search as traceable array code: the per-lane table binary
    search runs on device inside jit (uniform u64 entropy comes from the
    host AES-CTR stream), and only the rare twin-table disagreements (a few
    hundred lanes per million) are resolved exactly on host via
    ``twin_cdt_resolve`` — same distribution as the reference sampler
    (gaussian_twin_cdt.go), with the fast path on the TPU.
    """

    def __init__(self, std_dev: float):
        self.std_dev = float(std_dev)
        self.tables = np.stack(
            [compute_cdt(i / BLOCK_SIZE, std_dev) for i in range(BLOCK_SIZE)])
        self.tail_hi = int(math.ceil(TWIN_CDT_TAIL_CUT * std_dev))
        self.tail_lo = -self.tail_hi
        self._flat = np.ascontiguousarray(self.tables.reshape(-1))
        self.tbl_len = self.tables.shape[1]
        # u64 thresholds split into 3 exact f32 planes (22/21/21 bits) so the
        # search can run as an MXU one-hot matmul + lexicographic compare.
        # Registered with devconst so stage programs pass the tables as jit
        # arguments instead of baking ~MB inline HLO constants.
        from ..ops import devconst
        t = self.tables
        self._tf32 = devconst.register(self, "tf32", np.stack([
            (t >> np.uint64(42)).astype(np.float32),
            ((t >> np.uint64(21)) & np.uint64(0x1FFFFF)).astype(np.float32),
            (t & np.uint64(0x1FFFFF)).astype(np.float32),
        ]))  # [3, 128, T]
        try:  # byte planes for the Pallas search kernel (jax-only import)
            from ..ops.twin_pallas import _byte_planes_tables
            self.pallas_planes = devconst.register(
                self, "pallas_planes", _byte_planes_tables(self.tables))
        except Exception:  # pragma: no cover — jax/pallas unavailable
            self.pallas_planes = None

    # -- traceable (device) part --------------------------------------------

    def _bsearch(self, xp, cc, u):
        """Vectorized per-lane binary search in table row cc (Go
        slices.BinarySearch semantics with the found -> v-1 adjustment)."""
        T = self.tbl_len
        base = cc * T
        lo = xp.zeros(u.shape, dtype=xp.int32)
        hi = xp.full(u.shape, T, dtype=xp.int32)
        flat = self._flat  # numpy constant -> embedded in HLO
        for _ in range(T.bit_length()):
            mid = (lo + hi) >> 1
            probe = xp.take(flat, base + xp.minimum(mid, T - 1))
            less = probe < u
            mid_ok = mid < hi
            lo = xp.where(mid_ok & less, mid + 1, lo)
            hi = xp.where(mid_ok & ~less, mid, hi)
        pos = lo
        eq = (pos < T) & (xp.take(flat, base + xp.minimum(pos, T - 1)) == u)
        return (pos - eq).astype(xp.int64)

    def _count_search(self, xp, cc, u):
        """Gather-free search for the device path: per-lane table rows come
        from a one-hot MXU matmul over exact f32 planes, and the position is
        a lexicographic compare-and-count.  Bit-identical to _bsearch.

        cc: int32 table index per lane (or None = table 0), u: uint64."""
        shape = u.shape
        uf = u.reshape(-1)
        uh = (uf >> xp.uint64(42)).astype(xp.float32)[:, None]
        um = ((uf >> xp.uint64(21)) & xp.uint64(0x1FFFFF)
              ).astype(xp.float32)[:, None]
        ul = (uf & xp.uint64(0x1FFFFF)).astype(xp.float32)[:, None]
        from ..ops import devconst
        tf32 = devconst.get(self, "tf32")
        if cc is None:
            rh, rm, rl = (tf32[i, 0][None, :] for i in range(3))
        else:
            import jax
            oh = jax.nn.one_hot(cc.reshape(-1), BLOCK_SIZE, dtype=xp.float32)
            rh, rm, rl = (
                xp.dot(oh, tf32[i], precision=jax.lax.Precision.HIGHEST)
                for i in range(3))
        hi_lt = rh < uh
        hi_eq = rh == uh
        mid_lt = rm < um
        mid_eq = rm == um
        lt = hi_lt | (hi_eq & (mid_lt | (mid_eq & (rl < ul))))
        le = hi_lt | (hi_eq & (mid_lt | (mid_eq & (rl <= ul))))
        n_lt = lt.sum(axis=-1, dtype=xp.int32)
        n_le = le.sum(axis=-1, dtype=xp.int32)
        v = n_lt - (n_le > n_lt)
        return v.astype(xp.int64).reshape(shape)

    def search(self, centers, u, zero_center: bool = False):
        """Traceable fast path.  centers f64, u uint64, same shape.

        Returns (prov, agree, c_floor, c_frac, v0, v1): ``prov`` is the
        sampled value where the twin tables agree; disagreeing lanes must be
        patched with ``resolve_host``.  ``zero_center=True`` skips the second
        search (c0 == c1 == 0, e.g. MLWE noise)."""
        from ..fields.limb import get_xp
        xp = get_xp(u)
        if zero_center:
            if xp is np:
                v0 = self._bsearch(np, np.zeros(u.shape, dtype=np.int64), u)
            else:
                zc = xp.zeros(u.shape, dtype=xp.int32)
                v0, _ = self._search_dev(xp, zc, zc, u)
            prov = v0 + self.tail_lo
            agree = xp.ones(u.shape, dtype=bool)
            zf = xp.zeros(u.shape)
            return prov, agree, zf, zf, v0, v0
        c_floor = xp.floor(centers)
        c_frac = centers - c_floor
        c0 = (xp.floor(BLOCK_SIZE * c_frac).astype(xp.int32)) % BLOCK_SIZE
        c1 = (xp.ceil(BLOCK_SIZE * c_frac).astype(xp.int32)) % BLOCK_SIZE
        if xp is np:
            v0 = self._bsearch(np, c0, u)
            v1 = np.where(c0 == c1, v0, self._bsearch(np, c1, u))
        else:
            v0, v1 = self._search_dev(xp, c0, c1, u)
        agree = v0 == v1
        prov = v0 + c_floor.astype(xp.int64) + self.tail_lo
        return prov, agree, c_floor, c_frac, v0, v1

    def _search_dev(self, xp, c0, c1, u):
        """Traced search for both twin tables: Pallas kernel on TPU
        (ops/twin_pallas.py), one-hot MXU count search elsewhere."""
        from .. import backend
        if backend.use_pallas():
            if not hasattr(self, "_pallas_search"):
                from ..ops.twin_pallas import TwinSearchPallas
                self._pallas_search = TwinSearchPallas(self)
            return self._pallas_search(c0, c1, u)
        v0 = self._count_search(xp, c0, u)
        v1 = xp.where(c0 == c1, v0, self._count_search(xp, c1, u))
        return v0, v1

    def resolve_device(self, xp, c_frac, u, v0, v1, c_floor, valid=None,
                       tier2: int = 4096):
        """Traced exact CDF walk for disagreeing lanes — the same formula as
        ``twin_cdt_resolve`` (reference gaussian_twin_cdt.go:94-110), run in
        f64 on device so the fix-up never leaves the chip.

        ``valid`` (bool [lanes], optional): lanes that are real fixes —
        sentinel-padded lanes gather some arbitrary real lane's values, and
        if that lane sits within MARGIN of its CDF boundary every padded
        copy would count as 'close' and could exhaust the TIER2 exact-f64
        slots; masking them out keeps tier 2 for genuine near-boundary
        lanes.

        The masked-sum reduction order (and the device exp) can differ from
        the host path by ULPs; an outcome flips only when the uniform draw
        lands within ~2^-50 of the CDF boundary, which is statistically
        irrelevant for the masking distribution (any sample from the walk is
        a valid opening — soundness never depends on this choice)."""
        xs = np.arange(self.tail_lo, 2 * self.tail_hi + 1, dtype=np.float64)
        norm = math.sqrt(2 * math.pi) * self.std_dev
        idx = xp.clip(v0 - self.tail_lo, 0, len(xs) - 1)
        inv2s2 = 1.0 / (2 * self.std_dev ** 2)
        if xp is np:
            rho = np.exp(-(xs[None, :] - c_frac[:, None]) ** 2 * inv2s2) / norm
            within = np.arange(len(xs))[None, :] <= idx[:, None]
            cdf_at_v0 = np.where(within, rho, 0.0).sum(axis=1)
        else:
            import jax
            # Two-tier CDF: a scan in f32 (fast VPU transcendentals; f64
            # exp on TPU is software-emulated and dominated the whole
            # commit program) decides every lane whose uniform draw is
            # farther than MARGIN from the boundary; the few lanes inside
            # the margin are recomputed exactly in f64.  |cdf32 - cdf64|
            # <= ~1e-5 (133 terms, f32 exp/arg error), so MARGIN = 1e-4
            # gives a 10x safety factor and the outcome equals the host
            # path's everywhere.
            MARGIN = 1e-4
            n_lanes = c_frac.shape[0]
            T = len(xs)
            c32 = c_frac.astype(xp.float32)
            # dense [lanes, T] in f32: the commit pipeline runs one proof's
            # resolve per program (pipelined, not vmapped), so ~100MB of
            # transient rho is fine and avoids a T-step scan's launch
            # overhead
            rho32 = xp.exp(-(xp.asarray(xs, dtype=xp.float32)[None, :]
                             - c32[:, None]) ** 2 * np.float32(inv2s2)
                           ) * np.float32(1.0 / norm)
            within = xp.arange(T, dtype=xp.int32)[None, :] <= idx[:, None]
            cdf32 = xp.where(within, rho32, np.float32(0.0)).sum(axis=1)
            p_f = u.astype(xp.float64) / 2.0 ** 64
            cdf = cdf32.astype(xp.float64)
            close = xp.abs(p_f - cdf) < MARGIN
            if valid is not None:
                close = close & valid
            # tier2 default ~100x one commit's expected margin population;
            # batched callers scale it by t (their lane count is CAP*t)
            from ..fields import limb as _limb
            i2 = _limb.nonzero_idx(xp, close, tier2)
            safe = xp.minimum(i2, n_lanes - 1)
            cf2 = xp.take(c_frac, safe)
            idx2 = xp.take(idx, safe)
            rho64 = xp.exp(-(xp.asarray(xs)[None, :] - cf2[:, None]) ** 2
                           * inv2s2) / norm
            within2 = xp.arange(T, dtype=xp.int32)[None, :] <= idx2[:, None]
            cdf64 = xp.where(within2, rho64, 0.0).sum(axis=1)
            cdf = cdf.at[i2].set(cdf64, mode="drop")
            res = xp.where(p_f < cdf, v0, v1)
            return res + self.tail_lo + c_floor.astype(xp.int64)
        p = u.astype(xp.float64) / 2.0 ** 64
        res = xp.where(p < cdf_at_v0, v0, v1)
        return res + self.tail_lo + c_floor.astype(xp.int64)

    # -- host part ------------------------------------------------------------

    def resolve_host(self, c_frac, u, v0, v1, c_floor) -> np.ndarray:
        """Exact host fix-up for disagreeing lanes (all args host numpy,
        gathered at the bad lane indices)."""
        res = twin_cdt_resolve(self.std_dev, self.tail_lo, self.tail_hi,
                               np.asarray(c_frac, dtype=np.float64),
                               np.asarray(u, dtype=np.uint64),
                               np.asarray(v0, dtype=np.int64),
                               np.asarray(v1, dtype=np.int64))
        return res + self.tail_lo + np.asarray(c_floor).astype(np.int64)


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
