"""RNS residue-plane rings: Z_Q[X]/(X^d+1) with Q a product of NTT-friendly
word-size primes.

TPU-native replacement for the lattigo ``ring.Ring`` surface the reference
uses (SURVEY.md §2.2; jindo/params.go:279-301, jindo/prover.go:140-201,
jindo/verifier.go:26-200): polynomials are uint32 digit planes of shape
``[2, L, ..., d]`` — two 16-bit digits per residue, one plane per prime — and
every ring op is an elementwise limb kernel vectorized over (L, batch, d) at
once.  NTTs run through the generic stage-vectorized engine with per-prime
twiddle tables stacked on the lead axis.

Primes are capped at 30 bits by default (vs lattigo's ~60-bit primes): a
30-bit Montgomery product costs 4 digit muls instead of 16, and the security
derivation in jindo.params only depends on the total modulus size
2^(bits*count), which is preserved.  The prime search itself mirrors
lattigo's NTTFriendlyPrimesGenerator.NextUpstreamPrimes: candidates
2^bits + 1 + i*nth_root, ascending.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields import limb
from ..fields.spec import DIGIT_BITS, FieldSpec, is_probable_prime
from ..ops import ntt as nttmod

RNS_W = 2  # digits per residue: primes < 2^31, Montgomery radix 2^32


def ntt_friendly_primes(bits: int, nth_root: int, count: int,
                        upstream: bool = True) -> list[int]:
    """Next ``count`` primes q = 2^bits +/- i*nth_root + 1 with q = 1 mod
    nth_root (lattigo NTTFriendlyPrimesGenerator semantics)."""
    out = []
    base = 1 << bits
    step = nth_root if upstream else -nth_root
    q = base + 1
    while len(out) < count:
        if q > 3 and is_probable_prime(q):
            out.append(q)
        q += step
        if q < nth_root:
            raise ValueError("prime search exhausted")
    return out


@functools.lru_cache(maxsize=None)
def _rns_tables(primes: tuple[int, ...], d: int):
    """Stacked per-prime NTT tables + Montgomery constants."""
    L = len(primes)
    tw = np.zeros((RNS_W, L, d), dtype=np.uint32)
    twinv = np.zeros((RNS_W, L, d), dtype=np.uint32)
    ninv = np.zeros((RNS_W, L), dtype=np.uint32)
    q = np.zeros((RNS_W, L), dtype=np.uint32)
    r2 = np.zeros((RNS_W, L), dtype=np.uint32)
    one = np.zeros((RNS_W, L), dtype=np.uint32)
    qinv16 = np.zeros(L, dtype=np.uint32)
    R = 1 << (DIGIT_BITS * RNS_W)
    for i, p in enumerate(primes):
        # FieldSpec is only used for generator search; b/k are placeholders.
        s = FieldSpec(p=p, b=p - 1, k=1)
        t, tinv, nv = nttmod._tables_host(p, p - 1, 1, d, True)
        tw[:, i, :] = limb.ints_to_digits([x * R % p for x in t], RNS_W)
        twinv[:, i, :] = limb.ints_to_digits([x * R % p for x in tinv], RNS_W)
        ninv[:, i] = limb.ints_to_digits([nv * R % p], RNS_W)[:, 0]
        q[:, i] = limb.ints_to_digits([p], RNS_W)[:, 0]
        r2[:, i] = limb.ints_to_digits([R * R % p], RNS_W)[:, 0]
        one[:, i] = limb.ints_to_digits([1], RNS_W)[:, 0]
        qinv16[i] = (-pow(p, -1, 1 << DIGIT_BITS)) % (1 << DIGIT_BITS)
    return tw, twinv, ninv, q, r2, one, qinv16


class _RnsNTTPlan:
    def __init__(self, tw, twinv, ninv, q, qinv16, n):
        self.tw, self.twinv, self.ninv = tw, twinv, ninv
        self.q, self.qinv16, self.n = q, qinv16, n


class RnsRing:
    """Negacyclic RNS ring of degree d over a chain of primes.

    Poly layout: uint32 ``[2, L, *batch, d]``; plain (non-Montgomery) residues
    unless explicitly MForm'd, mirroring the reference's domain discipline.
    """

    def __init__(self, d: int, primes):
        primes = tuple(int(p) for p in primes)
        if any(p % (2 * d) != 1 for p in primes):
            raise ValueError("primes must be 1 mod 2d")
        self.d = d
        self.primes = primes
        self.L = len(primes)
        tw, twinv, ninv, q, r2, one, qinv16 = _rns_tables(primes, d)
        self.qd = q            # [2, L]
        self.r2d = r2
        self.oned = one
        self.qinv16 = qinv16   # [L]
        self.plan = _RnsNTTPlan(tw, twinv, ninv, q, qinv16, d)
        self.modulus = 1
        for p in primes:
            self.modulus *= p

    # ---- construction ----------------------------------------------------

    def new_poly(self, *batch, xp=np):
        return xp.zeros((RNS_W, self.L, *batch, self.d), dtype=xp.uint32)

    def from_u64(self, residues) -> np.ndarray:
        """uint64 residues [L, *batch, d] -> digit planes [2, L, *batch, d]."""
        xp = limb.get_xp(residues)
        lo = (residues & xp.uint64(0xFFFF)).astype(xp.uint32)
        hi = ((residues >> xp.uint64(DIGIT_BITS)) & xp.uint64(0xFFFF)).astype(xp.uint32)
        return xp.stack([lo, hi], axis=0)

    def to_u64(self, poly) -> np.ndarray:
        xp = limb.get_xp(poly)
        p = poly.astype(xp.uint64)
        return p[0] | (p[1] << xp.uint64(DIGIT_BITS))

    def embed_int64(self, values, xp=None):
        """Signed int64 values [*batch, d], |v| < 2^52 -> plain residue
        planes (reference setCoeffSigned, jindo/utils.go:49-60).

        The jax path avoids the int64 ``%`` (software-emulated long division
        on TPU): quotient estimate in f64 (exact input represention for
        |v| < 2^52), exact remainder in int64, +/-1 correction."""
        if xp is None:
            xp = limb.get_xp(values)
        v = xp.asarray(values, dtype=xp.int64)
        if xp is np:
            qs = np.array(self.primes, dtype=np.int64).reshape(
                self.L, *([1] * v.ndim))
            res = (v[None, ...] % qs).astype(xp.uint64)
            return self.from_u64(res)
        qs = np.array(self.primes, dtype=np.int64).reshape(
            self.L, *([1] * v.ndim))
        inv_q = (1.0 / np.array(self.primes, dtype=np.float64)).reshape(
            self.L, *([1] * v.ndim))
        vf = v[None, ...].astype(xp.float64)
        m = xp.floor(vf * inv_q).astype(xp.int64)
        r = v[None, ...] - m * qs  # exact in int64
        r = xp.where(r < 0, r + qs, r)
        r = xp.where(r >= qs, r - qs, r)
        return self.from_u64(r.astype(xp.uint64))

    # ---- broadcasting helpers --------------------------------------------

    def _c(self, const, a):
        """[2, L] constant -> broadcast against [2, L, *batch, d] value.
        Kept numpy so it embeds as an HLO constant under tracing."""
        return np.asarray(const).reshape(2, self.L, *([1] * (a.ndim - 2)))

    def _qinv(self, a):
        return np.asarray(self.qinv16).reshape(self.L, *([1] * (a.ndim - 2)))

    # ---- ring ops (elementwise over [2, L, *batch, d]) --------------------

    def add(self, a, b):
        return limb.add(a, b, self._c(self.qd, a))

    def sub(self, a, b):
        return limb.sub(a, b, self._c(self.qd, a))

    def neg(self, a):
        return limb.neg(a, self._c(self.qd, a))

    def mform(self, a):
        return limb.mont_mul(a, self._c(self.r2d, a), self._c(self.qd, a), self._qinv(a))

    def imform(self, a):
        return limb.mont_mul(a, self._c(self.oned, a), self._c(self.qd, a), self._qinv(a))

    def mul_mont(self, a, b):
        """a (Montgomery) * b -> same domain as b (lattigo
        MulCoeffsMontgomery)."""
        return limb.mont_mul(a, b, self._c(self.qd, a), self._qinv(a))

    def mul_mont_add(self, a, b, c):
        """c + a*b (a Montgomery)."""
        return self.add(c, self.mul_mont(a, b))

    def mul_mont_sub(self, c, a, b):
        """c - a*b (a Montgomery)."""
        return self.sub(c, self.mul_mont(a, b))

    def mul_scalar_mont(self, a, scalar_rns_mont):
        """Pointwise by per-prime scalar in Montgomery form [2, L]
        (lattigo MulRNSScalarMontgomery)."""
        return limb.mont_mul(a, self._c(scalar_rns_mont, a),
                             self._c(self.qd, a), self._qinv(a))

    def scalar_rns_mont(self, value: int) -> np.ndarray:
        """Host: integer scalar -> per-prime Montgomery residues [2, L]."""
        R = 1 << (DIGIT_BITS * RNS_W)
        out = np.zeros((RNS_W, self.L), dtype=np.uint32)
        for i, p in enumerate(self.primes):
            out[:, i] = limb.ints_to_digits([(value % p) * R % p], RNS_W)[:, 0]
        return out

    def ntt(self, a):
        return nttmod.ntt_fwd(self.plan, a)

    def intt(self, a):
        return nttmod.ntt_inv(self.plan, a)

    # ---- fused transforms (matmul NTT on the MXU under jax) ---------------

    def _matmul_ntt(self):
        if not hasattr(self, "_mm_ntt"):
            from ..ops.ntt_matmul import MAX_D, MatmulNTT
            self._mm_ntt = MatmulNTT(self) if self.d <= MAX_D else None
        return self._mm_ntt

    # rows below this use the XLA matmul path (the Pallas kernel pads the
    # row axis to its tile and costs a fixed dispatch)
    PALLAS_MIN_ROWS = 512

    def _pallas_ntt(self):
        if not hasattr(self, "_pl_ntt"):
            from .. import backend

            mm = self._matmul_ntt()
            if mm is None or not backend.use_pallas():
                self._pl_ntt = None
            else:
                from ..ops.ntt_pallas import PallasNTT
                self._pl_ntt = PallasNTT(mm)
        return self._pl_ntt

    def devconst_owners(self):
        """Table owners for jitted callers (ops/devconst.py)."""
        owners = []
        if self._matmul_ntt() is not None:
            owners.append(self._mm_ntt)
        if self._pallas_ntt() is not None:
            owners.append(self._pl_ntt)
        return owners

    def ntt_mform(self, a):
        """ntt(mform(a)) — one fused MXU pass under jax: the Pallas kernel
        (ops/ntt_pallas.py, recombine fused into the matmul epilogue) for
        large row counts, the XLA matmul (ops/ntt_matmul.py) otherwise."""
        if limb.get_xp(a) is not np:
            pk = self._pallas_ntt()
            if pk is not None and self._nrows(a) >= self.PALLAS_MIN_ROWS:
                return pk.ntt_mform(a)
            mm = self._matmul_ntt()
            if mm is not None:
                return mm.ntt_mform(a)
        return self.ntt(self.mform(a))

    def intt_imform(self, a):
        """intt(imform(a)) — one fused MXU pass under jax."""
        if limb.get_xp(a) is not np:
            pk = self._pallas_ntt()
            if pk is not None and self._nrows(a) >= self.PALLAS_MIN_ROWS:
                return pk.intt_imform(a)
            mm = self._matmul_ntt()
            if mm is not None:
                return mm.intt_imform(a)
        return self.intt(self.imform(a))

    @staticmethod
    def _nrows(a) -> int:
        n = 1
        for s in a.shape[2:-1]:
            n *= int(s)
        return n

    # ---- serialization (transcript binding) -------------------------------

    def to_bytes(self, poly) -> bytes:
        """Canonical little-endian uint64 planes, level-major (replaces
        lattigo Poly.WriteTo for Fiat-Shamir binding).  ``astype('<u8')``
        makes the byte order explicit so transcripts and wire formats agree
        across host endianness."""
        return np.ascontiguousarray(
            self.to_u64(np.asarray(poly)).astype("<u8")).tobytes()


class RnsReconstructor:
    """Exact CRT reconstruction RNS -> balanced big ints and back.

    Reference: jindo/rns.go (reconstructTo / setBigCoeffTo), including the
    small-value fast path — vectorized here so typical polynomials never touch
    Python ints.
    """

    def __init__(self, ring: RnsRing):
        self.ring = ring
        Q = ring.modulus
        self.Q = Q
        self.q_half = Q >> 1
        self.gad = []
        for p in ring.primes:
            qdiv = Q // p
            self.gad.append(qdiv * pow(qdiv, -1, p) % Q)

    def reconstruct(self, poly) -> list[int]:
        """Plain-domain poly [2, L, d] (or [2, L, *batch, d] flattened by the
        caller) -> balanced Python ints.  Prefers the native C++ CRT kernel
        (csrc/ringo_native.cpp) — the reference uses lattigo's accelerated
        path the same way (jindo/verifier.go:164-200)."""
        from .. import native

        rb = native.reconstruct_balanced(self.ring, poly)
        if rb is not None:
            mag, neg = rb
            n, W = mag.shape
            cols = [mag[:, j] for j in range(W)]
            out = []
            for i in range(n):
                v = int(cols[0][i])
                for j in range(1, W):
                    vj = int(cols[j][i])
                    if vj:
                        v |= vj << (64 * j)
                out.append(-v if neg[i] else v)
            return out
        u = self.ring.to_u64(np.asarray(poly))  # [L, ..., d] u64
        flat = u.reshape(self.ring.L, -1)
        qs = np.array(self.ring.primes, dtype=np.int64).reshape(-1, 1)
        signed = flat.astype(np.int64)
        signed = np.where(signed > (qs >> 1), signed - qs, signed)
        small = (signed == signed[0:1]).all(axis=0)
        out = [0] * flat.shape[1]
        idx_small = np.nonzero(small)[0]
        s0 = signed[0]
        for i in idx_small:
            out[i] = int(s0[i])
        idx_big = np.nonzero(~small)[0]
        if len(idx_big):
            cols = flat[:, idx_big]
            for j, i in enumerate(idx_big):
                acc = 0
                for l in range(self.ring.L):
                    acc += int(cols[l, j]) * self.gad[l]
                acc %= self.Q
                if acc >= self.q_half:
                    acc -= self.Q
                out[i] = acc
        return out

    def set_bigints(self, values: list[int]) -> np.ndarray:
        """Python ints -> plain residue planes [2, L, len(values)] with
        trailing axis = coefficients."""
        L = self.ring.L
        res = np.zeros((L, len(values)), dtype=np.uint64)
        for l, p in enumerate(self.ring.primes):
            res[l] = np.array([v % p for v in values], dtype=np.uint64)
        return self.ring.from_u64(res)


class BasisExtender:
    """Exact centered lift from ring_src to ring_dst (replaces lattigo
    BasisExtender.ModUpQtoP at jindo/verifier.go:40,173).

    Values are interpreted balanced in (-Q_src/2, Q_src/2] and reduced mod
    each destination prime.  Exact (lattigo's version is an approximate
    floating-point base extension)."""

    def __init__(self, ring_src: RnsRing, ring_dst: RnsRing):
        self.src = ring_src
        self.dst = ring_dst
        self.rec = RnsReconstructor(ring_src)
        # 2^(32j) mod p per destination prime, for folding the native
        # kernel's 64-bit magnitude words (split into 32-bit halves so
        # products stay < 2^62 in u64)
        W = -(-ring_src.modulus.bit_length() // 64)
        self._pw32 = np.array(
            [[pow(2, 32 * j, p) for j in range(2 * W)]
             for p in ring_dst.primes], dtype=np.uint64)  # [dstL, 2W]

    def lift(self, poly) -> np.ndarray:
        from .. import native

        rb = native.reconstruct_balanced(self.src, poly)
        if rb is not None:
            mag, neg = rb                       # [n, W] u64, [n] u8
            n, W = mag.shape
            halves = np.empty((n, 2 * W), dtype=np.uint64)
            halves[:, 0::2] = mag & np.uint64(0xFFFFFFFF)
            halves[:, 1::2] = mag >> np.uint64(32)
            out = np.zeros((self.dst.L, n), dtype=np.uint64)
            for l, p in enumerate(self.dst.primes):
                terms = (halves * self._pw32[l][None, :]) % np.uint64(p)
                r = terms.sum(axis=1) % np.uint64(p)  # sum < 2W * 2^30
                out[l] = np.where(neg.astype(bool) & (r != 0),
                                  np.uint64(p) - r, r)
            return self.dst.from_u64(out)
        vals = self.rec.reconstruct(poly)
        out = np.zeros((self.dst.L, len(vals)), dtype=np.uint64)
        for l, p in enumerate(self.dst.primes):
            out[l] = np.array([v % p for v in vals], dtype=np.uint64)
        return self.dst.from_u64(out)
