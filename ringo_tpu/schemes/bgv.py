"""Minimal BGV/BFV scheme over RnsRing — replaces the lattigo bgv/rlwe layer
that the reference's bfv example depends on (examples/bfv/main.go:89-125).

Implements exactly what the example needs: ternary secret keygen, plaintext
scale-up (RingT -> RingQ by Delta = round(q/t) multiples), and symmetric
encryption c = (-a*s + Delta*m + e, a).  Coefficients are kept in plain
(non-NTT) domain at the API boundary so modulus-switching into Buckler's
big prime field is direct.
"""

from __future__ import annotations

import numpy as np

from ..csprng import RoundedGaussianSampler, UniformSampler
from ..rings.rns import RnsReconstructor, RnsRing, ntt_friendly_primes


class BGVParams:
    def __init__(self, log_n: int, q_bits: list[int], t: int,
                 limb_bits: int = 30):
        self.n = 1 << log_n
        self.t = t
        primes: list[int] = []
        # split each requested prime budget into <= limb_bits-bit primes
        total_bits = sum(q_bits)
        count = -(-total_bits // limb_bits)
        bits = -(-total_bits // count)
        self.primes = ntt_friendly_primes(bits, 2 * self.n, count)
        self.ring_q = RnsRing(self.n, self.primes)
        self.q = self.ring_q.modulus
        # lattigo-bgv style scale factor: exact inverse t^{-1} mod q, so that
        # t * Delta = 1 (mod q) — this is what the reference example's
        # modulus-switched circuit Delta assumes (examples/bfv/main.go:161).
        self.delta = pow(t, -1, self.q)


class SecretKey:
    def __init__(self, coeffs: np.ndarray):
        self.coeffs = coeffs  # signed int64 ternary [n]


class BGV:
    def __init__(self, params: BGVParams, seed: bytes | None = None):
        self.params = params
        self.uniform = UniformSampler(seed)
        self.gauss = RoundedGaussianSampler(
            None if seed is None else seed + b"g")
        self.rec = RnsReconstructor(params.ring_q)

    def gen_secret_key(self) -> SecretKey:
        n = self.params.n
        s = (self.uniform.sample_n(3, n).astype(np.int64) - 1)
        return SecretKey(s)

    def encrypt(self, sk: SecretKey, m: np.ndarray, err_std: float = 3.2):
        """Symmetric BFV encryption: returns (c0, c1, e) with
        c0 = -c1*s + Delta*m + e; all in plain coefficient domain as
        RnsRing digit planes [2, L, n]; e as signed int64 (for the proof)."""
        p = self.params
        ring = p.ring_q
        n = p.n
        # uniform mask c1
        qs = np.array(ring.primes, dtype=np.uint64)
        res = np.empty((ring.L, n), dtype=np.uint64)
        for l, q in enumerate(ring.primes):
            res[l] = self.uniform.sample_n(int(q), n)
        c1 = ring.from_u64(res)
        # error
        e = self.gauss.sample(0.0, err_std, n)
        # Delta * m mod q (host ints; m in [0, t))
        dm = [int(p.delta) * int(mi) % p.q for mi in np.asarray(m)]
        dm_poly = self.rec.set_bigints(dm)
        # c0 = -(c1 * s) + dm + e
        s_poly = ring.embed_int64(sk.coeffs[None, :])[:, :, 0, :]
        c1s = ring.intt(ring.mul_mont(ring.mform(ring.ntt(c1)), ring.ntt(s_poly)))
        c0 = ring.add(ring.neg(c1s), dm_poly)
        c0 = ring.add(c0, ring.embed_int64(e[None, :])[:, :, 0, :])
        return c0, c1, e

    def decrypt(self, sk: SecretKey, c0, c1) -> np.ndarray:
        """phase = Delta*m + e; t*phase = m + t*e (mod q), so m is the
        centered residue t*phase mod q, reduced mod t."""
        p = self.params
        ring = p.ring_q
        s_poly = ring.embed_int64(sk.coeffs[None, :])[:, :, 0, :]
        c1s = ring.intt(ring.mul_mont(ring.mform(ring.ntt(c1)), ring.ntt(s_poly)))
        phase = ring.add(c0, c1s)
        vals = self.rec.reconstruct(phase)
        out = []
        for v in vals:
            u = (p.t * v) % p.q
            if u > p.q // 2:
                u -= p.q
            out.append(u % p.t)
        return np.array(out, dtype=np.int64)
