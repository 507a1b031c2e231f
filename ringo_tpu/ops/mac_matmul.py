"""Exact mod-q MAC contractions on the MXU — the Ajtai-product kernel.

The inner/outer commitment MACs (reference jindo/prover.go:149-157,186-200,
AVX512 mulVec/MAC) contract a commit-key matrix against encoded witnesses
pointwise per (prime, coefficient) lane:

    com[l, j, n, :] = sum_k key[l, j, k, :] * x[l, k, n, :]  mod q_l

Instead of a lax.scan of VPU pointwise Montgomery muls (O(K) sequential
steps), the contraction runs as batched bf16 matmuls with exact integer
semantics, following the ops/ntt_matmul.py recipe but with BOTH operands
dynamic:

* x residues (< q < 2^30) split into P7=5 seven-bit planes x_a (exact in
  bf16); 7-bit planes keep partial sums 127^2 * K <= 2^24 exact in the f32
  MXU accumulator for contraction chunks K <= 1024;
* the key is pre-folded per plane weight: F_ab = ((2^7a * key mod q) >> 7b)
  & 127, with the Montgomery factor R^-1 folded in so a plain integer
  matmul reproduces mul_mont semantics (key Montgomery, x any domain);
* P_ab = F_ab @ x_a on the MXU, batched over (a, prime, coefficient);
  T_b = sum_a P_ab in int32; y = sum_b 2^7b * T_b in f64 (< 2^52, exact),
  Barrett-reduced mod q with +/-1 corrections.

Bit-identical to the scan-of-mont_mul path (tests/test_mac_matmul.py).
"""

from __future__ import annotations

import numpy as np

from ..fields.spec import DIGIT_BITS

P7 = 5          # 7-bit planes: 5 * 7 = 35 bits cover residues < 2^30
SHIFT = 7
PMAX = 127
KCHUNK = 1024   # 127^2 * 1024 < 2^24: f32 accumulation exact per chunk
MAX_K = 4096    # 5 * 127 * K * 2^30 < 2^52: f64 combine exact


def _residues(ring, x, xp):
    """Digit planes [2, L, ...] u32 -> residues u32 [L, ...]."""
    return x[0] | (x[1] << xp.uint32(DIGIT_BITS))


def fold_key(ring, key, xp, montgomery: bool = True):
    """Key digit planes [2, L, J, K, d] (u32) -> folded MAC planes
    [P7, L, d, P7*J, K] (bf16 under jax, f32 under numpy).

    Layout: planes[a, l, :, b*J + j, k] = ((2^7a * key'[l,j,k,:] mod q_l)
    >> 7b) & 127, with key' = key * R^-1 mod q when ``montgomery`` (so the
    integer matmul equals a mul_mont accumulation).  One-time per CRS."""
    L, J, K, d = key.shape[1], key.shape[2], key.shape[3], key.shape[4]
    if K > MAX_K:
        raise ValueError(f"MAC contraction length {K} > {MAX_K}")
    v = _residues(ring, key, xp).astype(xp.uint64)  # [L, J, K, d]
    qs = np.array(ring.primes, dtype=np.uint64).reshape(L, 1, 1, 1)
    if montgomery:
        R = 1 << (DIGIT_BITS * 2)
        rinv = np.array([pow(R, -1, p) for p in ring.primes],
                        dtype=np.uint64).reshape(L, 1, 1, 1)
        v = (v * rinv) % qs  # both < 2^30: product < 2^60, exact in u64
    planes = []
    for a in range(P7):
        fa = (v << np.uint64(SHIFT * a)) % qs  # < 2^58, exact in u64
        bs = [((fa >> np.uint64(SHIFT * b)) & np.uint64(PMAX))
              for b in range(P7)]
        # [P7b, L, J, K, d] -> [L, d, P7b*J, K]
        pb = xp.transpose(xp.stack(bs), (1, 4, 0, 2, 3))
        pb = pb.reshape(L, d, P7 * J, K)
        planes.append(pb)
    out = xp.stack(planes)  # [P7a, L, d, P7b*J, K]
    if xp is np:
        return out.astype(np.float32)
    import jax.numpy as jnp
    return out.astype(jnp.bfloat16)


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

    key_planes [P7, L, d, P7*J, K]; x digit planes [2, L, K, n, d] u32.
    Returns digit planes [2, L, J, n, d] u32 — same value the scan of
    ``ring.mul_mont(key, x)`` accumulations produces."""
    L, d = ring.L, ring.d
    K, n = x.shape[2], x.shape[3]
    M = key_planes.shape[3]
    J = M // P7
    v = _residues(ring, x, xp)                    # [L, K, n, d]
    v = xp.moveaxis(v, 3, 1)                      # [L, d, K, n]
    dt = np.float32 if xp is np else None
    if dt is None:
        import jax.numpy as jnp
        dt = jnp.bfloat16
    xa = xp.stack([(v >> xp.uint32(SHIFT * a)) & xp.uint32(PMAX)
                   for a in range(P7)]).astype(dt)  # [P7a, L, d, K, n]

    n_chunks = -(-K // KCHUNK)
    acc = None
    for c in range(n_chunks):
        sl = slice(c * KCHUNK, min((c + 1) * KCHUNK, K))
        if xp is np:
            p = np.einsum("aldmk,aldkn->aldmn",
                          key_planes[:, :, :, :, sl], xa[:, :, :, sl, :],
                          dtype=np.float32).astype(np.int32)
        else:
            import jax
            import jax.numpy as jnp
            p = jnp.einsum("aldmk,aldkn->aldmn",
                           key_planes[:, :, :, :, sl], xa[:, :, :, sl, :],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
        acc = p if acc is None else acc + p
    t = acc.sum(axis=0).reshape(L, d, P7, J, n)   # int32, < 2^27
    y = None
    for b in range(P7):
        tb = t[:, :, b].astype(xp.float64) * float(1 << (SHIFT * b))
        y = tb if y is None else y + tb           # < 2^52, exact
    qs = np.array(ring.primes, dtype=np.float64).reshape(L, 1, 1, 1)
    m = xp.floor(y * (1.0 / qs))
    r = y - m * qs
    r = xp.where(r < 0, r + qs, r)
    r = xp.where(r >= qs, r - qs, r)
    out = r.astype(xp.uint32)                     # [L, d, J, n]
    out = xp.moveaxis(out, 1, 3)                  # [L, J, n, d]
    return xp.stack([out & xp.uint32(0xFFFF),
                     out >> xp.uint32(DIGIT_BITS)])
