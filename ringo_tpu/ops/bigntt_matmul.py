"""Big-field NTT on the MXU: recursive four-step with int8-matmul DFT blocks.

Replaces the butterfly-stage device engine (ops/bigntt.BigNTTDev — an
O(w)-scan VPU digit convolution per stage, 3 convs/stage, log2(n) stages)
for large-rank Buckler embedding rings: the reference's hot loop is exactly
these transforms (bigpoly/ntt.go:277-355 `nttInPlaceUnroll`).

Structure (cyclic, natural in/out, TRUE DFT order internally):

    X[k2 + n2*k1] = sum_{i1} (w^{n2})^{i1 k1} * [ w^{i1 k2} *
                    NTT_{n2}(x[i1 + n1*:])[k2] ]

* the radix-``leaf`` DFT blocks run as ONE exact int8 matmul each
  (ops/biglinmap.BigLinMap: banded byte-plane matrix, int32 MXU
  accumulation, Barrett reduce) — every level shares the same block
  because all sub-roots are the canonical g^(n/leaf);
* the inter-level twiddle grids w^(i1*k2) are elementwise bigmuls
  (ops/bigmul, the O(w)-scan path — only log_leaf(n) - 1 of them total
  instead of log2(n) butterfly stages);
* negacyclic transforms pre-twist by psi^i and untwist/scale on the way
  back (psi = order-2n generator, w = psi^2);
* a final constant gather permutes the result into ops/bigntt.BigNTTDev's
  exact output order, making this a bit-identical drop-in for BigRing's
  device plan (the engine order is derived once by simulating the stage
  recurrence on a sparse impulse with Python ints).

Bit-equality with BigNTTDev: tests/test_bigntt_matmul.py.
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec
from . import ntt as nttmod
from .biglinmap import BigLinMap
from .bigmul import BigMul


def make_device_plan(spec: FieldSpec, n: int, negacyclic: bool,
                     leaf: int | None = None):
    """Device NTT plan factory: the MXU matmul engine for wide fields at
    meaningful ranks, the butterfly-stage engine otherwise.  Both are
    bit-identical (tests/test_bigntt_matmul.py); RINGO_BIG_NTT=stage|matmul
    forces one."""
    import os

    from .bigntt import BigNTTDev

    mode = os.environ.get("RINGO_BIG_NTT", "auto")
    if mode not in ("auto", "stage", "matmul"):
        raise ValueError(f"RINGO_BIG_NTT={mode!r}: expected auto|stage|matmul")
    if mode == "stage":
        return BigNTTDev(spec, n, negacyclic)
    if mode == "matmul" or (spec.w >= 14 and n >= 256):
        return MatmulBigNTT(spec, n, negacyclic, leaf=leaf)
    return BigNTTDev(spec, n, negacyclic)


def _default_leaf(spec: FieldSpec) -> int:
    """Largest power-of-two block size <= 32 passing BigLinMap's exact-
    accumulation guards for this digit width (32 keeps the banded map an
    HLO constant of ~25 MB at w=55; 64 would be ~100 MB)."""
    leaf = 32
    while leaf > 2 and 255 * 255 * (2 * spec.w) * leaf >= 1 << 31:
        leaf //= 2
    return leaf


def _simulate_engine_order(spec: FieldSpec, n: int, negacyclic: bool,
                           tw: list[int], root: int) -> np.ndarray:
    """Run the BigNTTDev stage recurrence on the impulse delta_1 with
    Python ints (sparse: ~2n modmuls) and return perm with
    engine_out[j] = X_true[perm[j]], where X_true[k] = x(root^k) for
    cyclic and x(root^(2k+1)) for negacyclic (root = psi, order 2n) in
    natural k order."""
    p = spec.p
    x = [0] * n
    x[1] = 1
    m = 1
    while m <= n // 2:
        t = n // (2 * m)
        nxt = [0] * n
        for blk in range(m):
            twm = tw[m + blk]
            for j in range(t):
                u = x[blk * 2 * t + j]
                v = x[blk * 2 * t + t + j]
                vw = v * twm % p if v else 0
                nxt[blk * 2 * t + j] = (u + vw) % p
                nxt[blk * 2 * t + t + j] = (u - vw) % p
        x = nxt
        m <<= 1
    if negacyclic:
        pos = {}
        acc = root % p
        step = root * root % p
        for k in range(n):
            pos[acc] = k          # root^(2k+1)
            acc = acc * step % p
    else:
        pos = {}
        acc = 1
        for k in range(n):
            pos[acc] = k          # root^k
            acc = acc * root % p
    return np.array([pos[v] for v in x], dtype=np.int64)


class MatmulBigNTT:
    """Drop-in replacement for ops/bigntt.BigNTTDev (same fwd/inv
    signatures and bit-identical outputs), computing via MXU matmuls."""

    def __init__(self, spec: FieldSpec, n: int, negacyclic: bool,
                 leaf: int | None = None, generator: int | None = None,
                 order: str = "engine"):
        """``generator`` overrides the canonical root (order 2n if
        negacyclic, n otherwise) — used by the sharded four-step, whose
        sub-transforms must be powers of one fixed root.  ``order``:
        "engine" permutes outputs into BigNTTDev's exact order (drop-in
        mode); "dft" returns/accepts true DFT order in natural k (what
        parallel/bigntt's composition wants — skips two gathers)."""
        self.spec = spec
        self.n = n
        self.negacyclic = negacyclic
        self.order = order
        self.leaf = leaf if leaf is not None else _default_leaf(spec)
        # a tail block up to 2*leaf still passes BigLinMap's guards and
        # saves one twiddle+matmul level (e.g. 2^16 = 32*32*64)
        self.leaf_direct = self.leaf
        if 255 * 255 * (2 * spec.w) * (2 * self.leaf) < 1 << 31:
            self.leaf_direct = 2 * self.leaf
        self.big = BigMul(spec)
        p, w = spec.p, spec.w

        from . import devconst

        if negacyclic:
            psi = generator if generator is not None \
                else spec.find_generator(n, True)
            g = psi * psi % p
            # twist planes psi^i and untwist/scale psi^(-i) / n
            psi_inv = pow(psi, p - 2, p)
            n_inv = pow(n, p - 2, p)
            tws, unt = [], []
            a, b = 1, n_inv
            for _ in range(n):
                tws.append(a)
                unt.append(b)
                a = a * psi % p
                b = b * psi_inv % p
            self.twist = devconst.register(
                self, "twist", limb.ints_to_digits(tws, w))
            self.untwist_scale = devconst.register(
                self, "untwist", limb.ints_to_digits(unt, w))
        else:
            g = generator if generator is not None \
                else spec.find_generator(n, False)
            self.twist = None
            n_inv = pow(n, p - 2, p)
            self.scale = limb.ints_to_digits([n_inv], w)[:, 0]
        self.g = g

        if order == "engine":
            tw_engine, _, _ = nttmod._tables_host(
                p, spec.b, spec.k, n, negacyclic, generator=generator)
            perm = _simulate_engine_order(spec, n, negacyclic, tw_engine,
                                          g if not negacyclic else psi)
            self.perm_f = perm                  # engine_out = true_out[perm]
            inv_perm = np.empty(n, dtype=np.int64)
            inv_perm[perm] = np.arange(n)
            self.perm_b = inv_perm              # true_out = engine_out[...]
        else:
            self.perm_f = self.perm_b = None

        g_inv = pow(g, p - 2, p)
        self._maps = {}                         # (root, m) -> BigLinMap
        self._grids_f = [devconst.register(self, f"grid_f{i}", gr)
                         for i, gr in enumerate(self._build_grids(g))]
        self._grids_b = [devconst.register(self, f"grid_b{i}", gr)
                         for i, gr in enumerate(self._build_grids(g_inv))]
        # leaf maps built eagerly (not lazily at trace time) so devconst
        # table snapshots taken before the first trace see them
        n_l = n
        while n_l > self.leaf_direct:
            n_l //= self.leaf
        for tag, root in (("f", g), ("b", g_inv)):
            self._leaf_map(tag, root, n_l)
            if n_l != n:
                self._leaf_map(tag, root, self.leaf)

    def devconst_owners(self):
        """Objects holding registered tables used inside fwd/inv traces."""
        return [self] + list(self._maps.values())

    # -- plan tables ------------------------------------------------------
    def _leaf_map(self, root_tag: str, root: int, m: int) -> BigLinMap:
        key = (root_tag, m)
        if key not in self._maps:
            p = self.spec.p
            r = pow(root, self.n // m, p)       # canonical order-m root
            rows = [[pow(r, (k * i) % m, p) for i in range(m)]
                    for k in range(m)]
            self._maps[key] = BigLinMap(self.spec, rows, big=self.big)
        return self._maps[key]

    def _build_grids(self, root: int):
        """Twiddle grids per recursion level: level l transforms size
        n_l = n / leaf^l with outer factor n1 = leaf; grid[i1, k2] =
        (root^(n/n_l))^(i1*k2), digit planes [w, n1, n2]."""
        p, w = self.spec.p, self.spec.w
        grids = []
        n_l = self.n
        while n_l > self.leaf_direct:
            n1 = self.leaf
            n2 = n_l // n1
            wl = pow(root, self.n // n_l, p)
            flat = []
            for i1 in range(n1):
                r = pow(wl, i1, p)
                acc = 1
                for _ in range(n2):
                    flat.append(acc)
                    acc = acc * r % p
            grids.append(limb.ints_to_digits(flat, w).reshape(w, n1, n2))
            n_l = n2
        return grids

    # -- transform --------------------------------------------------------
    def _rec(self, x, n_l: int, level: int, root_tag: str, root: int, grids):
        """True-DFT-order transform of the last axis (size n_l)."""
        xp = limb.get_xp(x)
        if n_l <= self.leaf_direct:
            return self._leaf_map(root_tag, root, n_l).apply(x)
        w = self.spec.w
        n1 = self.leaf
        n2 = n_l // n1
        lead = x.shape[1:-1]
        g = x.reshape(x.shape[:-1] + (n2, n1))
        g = xp.swapaxes(g, -1, -2)                       # [.., i1, i2]
        g = self._rec(g, n2, level + 1, root_tag, root, grids)
        from . import devconst
        grid = devconst.get(self, f"grid_{root_tag}{level}").reshape(
            (w,) + (1,) * len(lead) + (n1, n2))
        g = self.big.mul_mod(g, xp.asarray(grid) + xp.zeros_like(g))
        g = xp.swapaxes(g, -1, -2)                       # [.., k2, i1]
        g = self._leaf_map(root_tag, root, n1).apply(g)  # [.., k2, k1]
        g = xp.swapaxes(g, -1, -2)                       # [.., k1, k2]
        return g.reshape(x.shape[:-1] + (n_l,))

    def fwd(self, x):
        """Forward NTT over the last axis; x plain planes [w, *batch, n].
        Output bit-identical to BigNTTDev.fwd."""
        xp = limb.get_xp(x)
        if self.twist is not None:
            from . import devconst
            tw = devconst.get(self, "twist").reshape(
                (self.spec.w,) + (1,) * (x.ndim - 2) + (self.n,))
            x = self.big.mul_mod(x, xp.asarray(tw) + xp.zeros_like(x))
        out = self._rec(x, self.n, 0, "f", self.g, self._grids_f)
        return out if self.perm_f is None else out[..., self.perm_f]

    def inv(self, x):
        """Inverse NTT (includes 1/n); input in BigNTTDev's NTT order.
        Output bit-identical to BigNTTDev.inv."""
        xp = limb.get_xp(x)
        y = x if self.perm_b is None else x[..., self.perm_b]  # true DFT order
        g_inv = pow(self.g, self.spec.p - 2, self.spec.p)
        out = self._rec(y, self.n, 0, "b", g_inv, self._grids_b)
        if self.twist is not None:
            from . import devconst
            un = devconst.get(self, "untwist").reshape(
                (self.spec.w,) + (1,) * (x.ndim - 2) + (self.n,))
            return self.big.mul_mod(out, xp.asarray(un) + xp.zeros_like(out))
        sc = np.asarray(self.scale).reshape(
            (self.spec.w,) + (1,) * (x.ndim - 1))
        return self.big.mul_mod(out, xp.asarray(sc) + xp.zeros_like(out))
