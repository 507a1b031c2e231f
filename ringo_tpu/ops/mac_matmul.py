"""Exact mod-q MAC contractions on the MXU — the Ajtai-product kernel.

The inner/outer commitment MACs (reference jindo/prover.go:149-157,186-200,
AVX512 mulVec/MAC) contract a commit-key matrix against encoded witnesses
pointwise per (prime, coefficient) lane:

    com[l, j, n, :] = sum_k key[l, j, k, :] * x[l, k, n, :]  mod q_l

Instead of a lax.scan of VPU pointwise Montgomery muls (O(K) sequential
steps), the contraction runs as ONE batched int8 matmul with exact integer
semantics (v5e's int8 MXU path accumulates in int32 natively):

* x residues (< 2^32) split into IN_PLANES=4 byte planes, offset by -128
  to fit signed int8, stacked along the contraction axis;
* the key is pre-folded asymmetrically: F[(b,j),(a,k)] =
  ((2^8a * key mod q) >> 7b) & 127 — byte-grain input weights (shorter
  contraction: 4K instead of 5K) but 7-bit output pieces (so F itself
  fits non-negative int8), with the Montgomery factor R^-1 folded in so a
  plain integer matmul reproduces mul_mont semantics (key Montgomery, x
  any domain);
* T = F @ (x - 128) on the MXU, batched over (prime, coefficient),
  contracting jointly over (a, k); adding back 128 * rowsum(F) (a cheap
  reduction of the constant key planes) gives the true column sums, all
  < 255 * 127 * 4K < 2^31 for K <= MAX_K — exact int32, no chunk loop;
* the output planes T_b (< 2^31) recombine to y = sum_b 2^7b * T_b mod q
  with u32 digit-plane Montgomery multiplies by the constants 2^7b * R —
  all-integer, no software-emulated f64.

The numpy backend keeps the original symmetric 7-bit-plane einsum, so the
cross-backend tests compare two independent schemes.  Bit-identical to the
scan-of-mont_mul path (tests/test_mac_matmul.py).
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import DIGIT_BITS

P7 = 5          # 7-bit OUTPUT planes: 5 * 7 = 35 bits cover values < 2^31
SHIFT = 7
PMAX = 127
IN_PLANES = 4   # byte INPUT planes (jax path): 4 * 8 = 32 bits
MAX_K = 16384   # 255 * 127 * IN_PLANES * K < 2^31: int32 accumulation exact
KCHUNK = 1024   # numpy-oracle einsum chunk: 127^2 * 1024 < 2^24 f32-exact


def _residues(ring, x, xp):
    """Digit planes [2, L, ...] u32 -> residues u32 [L, ...]."""
    return x[0] | (x[1] << xp.uint32(DIGIT_BITS))


def recombine_mod_q(ring, t, xp, shift: int = SHIFT):
    """Integer recombine: t int32 [L, *lead, P, J, n] plane sums (each
    < 2^31) -> residues u32 [L, *lead, J, n] equal to
    (sum_b 2^(shift*b) t_b) mod q.

    jax path: accumulate the exact value S = sum_b 2^(shift*b) t_b in a
    (lo, hi) u32 pair (6 VPU ops per plane), then reduce with exactly TWO
    digit-plane Montgomery multiplies — S mod q = mont(hi, R^2 mod q) +
    mont(lo, R mod q) — instead of one per plane.  numpy keeps the
    per-plane Montgomery loop as the independent oracle (both are exact
    for any t_b < 2^32, q < 2^31: CIOS output < 2q, reduced by the final
    conditional subtract)."""
    L = t.shape[0]
    P = t.shape[-3]
    tail = t.ndim - 2  # dims after L once the plane axis is consumed
    qd = np.asarray(ring.qd).reshape(2, L, *([1] * tail))
    qinv = np.asarray(ring.qinv16).reshape(L, *([1] * tail))
    R = 1 << (DIGIT_BITS * 2)
    if xp is not np and shift * (P - 1) <= 28:
        # S < 2^31 * P * 2^(shift*(P-1)) <= 2^63 for P <= 16, so
        # hi = S >> 32 < 2^31: exact u32 (the production shape is
        # shift=7, P=5 -> S < 2^59.1, hi < 2^28)
        mask = xp.uint32(0xFFFF)
        s_lo = s_hi = None
        for b in range(P):
            tb = t[..., b, :, :].astype(xp.uint32)
            sh = shift * b
            lo = tb << xp.uint32(sh) if sh else tb
            hi = tb >> xp.uint32(32 - sh) if sh else xp.zeros_like(tb)
            if s_lo is None:
                s_lo, s_hi = lo, hi
            else:
                s_lo = s_lo + lo               # mod 2^32
                s_hi = s_hi + hi + (s_lo < lo).astype(xp.uint32)
        cs = np.zeros((2, 2, L), dtype=np.uint32)  # [const, digit, L]
        for i, p in enumerate(ring.primes):
            for ci, c in enumerate((R * R % p, R % p)):
                cs[ci, 0, i] = c & 0xFFFF
                cs[ci, 1, i] = (c >> 16) & 0xFFFF
        c_hi = cs[0].reshape(2, L, *([1] * tail))
        c_lo = cs[1].reshape(2, L, *([1] * tail))
        hi_pl = xp.stack([s_hi & mask, s_hi >> xp.uint32(16)])
        lo_pl = xp.stack([s_lo & mask, s_lo >> xp.uint32(16)])
        acc = limb.add(limb.mont_mul(hi_pl, c_hi, qd, qinv),
                       limb.mont_mul(lo_pl, c_lo, qd, qinv), qd)
        return acc[0] | (acc[1] << xp.uint32(DIGIT_BITS))
    acc = None
    for b in range(P):
        tb = t[..., b, :, :].astype(xp.uint32)       # [L, *lead, J, n]
        tbp = xp.stack([tb & xp.uint32(0xFFFF), tb >> xp.uint32(16)])
        cb = np.zeros((2, L), dtype=np.uint32)
        for i, p in enumerate(ring.primes):
            c = (1 << (shift * b)) * R % p
            cb[0, i] = c & 0xFFFF
            cb[1, i] = (c >> 16) & 0xFFFF
        cbb = cb.reshape(2, L, *([1] * tail))
        term = limb.mont_mul(tbp, cbb, qd, qinv)
        acc = term if acc is None else limb.add(acc, term, qd)
    return acc[0] | (acc[1] << xp.uint32(DIGIT_BITS))


def fold_key(ring, key, xp, montgomery: bool = True):
    """Key digit planes [2, L, J, K, d] (u32) -> folded MAC planes.

    jax: int8 [L, d, P7*J, IN_PLANES*K] with
    planes[l, :, b*J + j, a*K + k] = ((2^8a * key'[l,j,k,:] mod q_l) >> 7b)
    & 127 and key' = key * R^-1 mod q when ``montgomery`` (so the integer
    matmul equals a mul_mont accumulation).  numpy: f32
    [P7, L, d, P7*J, K] for the einsum oracle.  One-time per CRS."""
    L, J, K, d = key.shape[1], key.shape[2], key.shape[3], key.shape[4]
    if K > MAX_K:
        raise ValueError(f"MAC contraction length {K} > {MAX_K}")
    v = _residues(ring, key, np if isinstance(key, np.ndarray) else xp
                  ).astype(xp.uint64)  # [L, J, K, d]
    qs = np.array(ring.primes, dtype=np.uint64).reshape(L, 1, 1, 1)
    if montgomery:
        R = 1 << (DIGIT_BITS * 2)
        rinv = np.array([pow(R, -1, p) for p in ring.primes],
                        dtype=np.uint64).reshape(L, 1, 1, 1)
        v = (v * rinv) % qs  # both < 2^31: product < 2^62, exact in u64
    if xp is np:
        planes = []
        for a in range(P7):
            fa = (v << np.uint64(SHIFT * a)) % qs  # < 2^59, exact in u64
            bs = [((fa >> np.uint64(SHIFT * b)) & np.uint64(PMAX))
                  for b in range(P7)]
            # [P7b, L, J, K, d] -> [L, d, P7b*J, K]
            pb = np.transpose(np.stack(bs), (1, 4, 0, 2, 3))
            pb = pb.reshape(L, d, P7 * J, K)
            planes.append(pb)
        return np.stack(planes).astype(np.float32)
    import jax.numpy as jnp
    out = jnp.zeros((L, d, P7 * J, IN_PLANES * K), dtype=jnp.int8)
    for a in range(IN_PLANES):
        fa = (v << xp.uint64(8 * a)) % qs
        for b in range(P7):
            pb = ((fa >> xp.uint64(SHIFT * b)) & xp.uint64(PMAX)
                  ).astype(jnp.int8)
            # [L, J, K, d] -> [L, d, J, K]
            out = out.at[:, :, b * J:(b + 1) * J, a * K:(a + 1) * K].set(
                jnp.transpose(pb, (0, 3, 1, 2)))
    return out


def fold_corr(planes):
    """-128-offset correction for ``fold_key`` jax planes: 128 * rowsum
    over the contraction axis, int32 [L, d, P7*J]."""
    import jax.numpy as jnp

    return 128 * jnp.sum(planes.astype(jnp.int32), axis=3)


def mod_mac_scan(ring, key, x):
    """Reference contraction as a python loop of mul_mont accumulations
    (numpy backend / test oracle).  key digit planes [2, L, J, K, d]
    (Montgomery), x [2, L, K, n, d]; returns [2, L, J, n, d]."""
    K = key.shape[3]
    acc = None
    for k in range(K):
        t = ring.mul_mont(key[:, :, :, k, :][:, :, :, None, :],
                          x[:, :, k, :, :][:, :, None, :, :])
        acc = t if acc is None else ring.add(acc, t)
    return acc


def mod_mac(ring, key_planes, x, xp):
    """Exact (key . x mod q) with key pre-folded by ``fold_key``.

    key_planes: int8 [L, d, P7*J, IN_PLANES*K] (jax) or f32
    [P7, L, d, P7*J, K] (numpy); the jax form may also be a
    ``(planes, corr)`` pair with corr = ``fold_corr(planes)`` precomputed
    (per-CRS tables cache it; ad-hoc folds let mod_mac derive it).
    x digit planes [2, L, K, n, d] u32.  Returns digit planes
    [2, L, J, n, d] — same value the scan of ``ring.mul_mont(key, x)``
    accumulations produces."""
    L, d = ring.L, ring.d
    K, n = x.shape[2], x.shape[3]
    v = _residues(ring, x, xp)                    # [L, K, n, d]
    v = xp.moveaxis(v, 3, 1)                      # [L, d, K, n]

    if xp is np:
        # einsum oracle in f32 (KCHUNK keeps partial sums < 2^24 exact)
        M = key_planes.shape[3]
        J = M // P7
        xa = np.stack([(v >> np.uint32(SHIFT * a)) & np.uint32(PMAX)
                       for a in range(P7)]).astype(np.float32)
        n_chunks = -(-K // KCHUNK)
        acc = None
        for c in range(n_chunks):
            sl = slice(c * KCHUNK, min((c + 1) * KCHUNK, K))
            p = np.einsum("aldmk,aldkn->aldmn",
                          key_planes[:, :, :, :, sl], xa[:, :, :, sl, :],
                          dtype=np.float32).astype(np.int64)
            acc = p if acc is None else acc + p
        t = acc.sum(axis=0).reshape(L, d, P7, J, n).astype(np.int32)
        out = recombine_mod_q(ring, t, np)
        out = np.moveaxis(out, 1, 3)
        return np.stack([out & np.uint32(0xFFFF),
                         out >> np.uint32(DIGIT_BITS)])

    import jax
    import jax.numpy as jnp

    corr = None
    if isinstance(key_planes, (tuple, list)):
        key_planes, corr = key_planes
    M = key_planes.shape[2]
    J = M // P7
    xa = jnp.concatenate(
        [(((v >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)).astype(jnp.int32)
          - 128).astype(jnp.int8)
         for a in range(IN_PLANES)], axis=2)      # [L, d, 4K, n] offset bytes
    t = jax.lax.dot_general(
        key_planes, xa,
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)         # [L, d, P7*J, n]
    # restore the -128 input offset: + 128 * rowsum(F) (precomputed for
    # per-CRS tables; derived here for ad-hoc challenge folds)
    if corr is None:
        corr = fold_corr(key_planes)
    t = t + corr[:, :, :, None]
    t = t.reshape(L, d, P7, J, n)
    out = recombine_mod_q(ring, t, jnp)           # [L, d, J, n]
    out = jnp.moveaxis(out, 1, 3)                 # [L, J, n, d]
    return jnp.stack([out & jnp.uint32(0xFFFF),
                      out >> jnp.uint32(DIGIT_BITS)])
