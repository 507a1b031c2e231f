"""Coefficient-sharded big-field NTT — the all-to-all scale-out pattern.

For embedding ranks >= 2^15 a single device's big-field NTT is the widest
tensor in a Buckler prove; the four-step (Bailey) decomposition splits an
n = n1*n2 cyclic NTT into

    1. n2-point NTTs along the local axis        (no communication)
    2. twiddle scaling by w^(i1*k2)              (local)
    3. transpose [n1, n2] -> [n2, n1]            (all-to-all over the mesh)
    4. n1-point NTTs along the new local axis    (no communication)

with the coefficient grid sharded over the ``sp`` mesh axis.  Under pjit
the resharding of step 3 lowers to an XLA all-to-all collective on ICI —
this is the "ring-attention-style pattern lives in the NTT" design from
SURVEY.md §5.  Bit-identical to the single-device BigNTTDev
(tests/test_parallel.py).

Index mapping (decimation-in-time): input x[i1 + n1*i2] lives at grid
[i1, i2]; output X[k2 + n2*k1] lands at grid [k1, k2] after step 4, i.e.
the result returns in the transposed order X_grid[k1][k2] — callers get a
poly back in natural order via one final reshape/transpose (also an
all-to-all under the mesh).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from ..fields import limb
from ..fields.spec import FieldSpec
from ..ops.bigntt import BigNTTDev
from ..ops import ntt as nttmod
from .commit import _ns


class ShardedBigNTT:
    """Four-step cyclic NTT of size n = n1 * n2 over Z_p, sharded over the
    mesh's ``sp`` axis.  ``fwd(x)`` takes/returns natural-order coefficient
    planes [w, n]."""

    def __init__(self, spec: FieldSpec, n: int, mesh: Mesh, n1: int | None = None):
        self.spec = spec
        self.n = n
        self.mesh = mesh
        if n1 is None:
            n1 = 1 << ((n - 1).bit_length() // 2)
        n2 = n // n1
        if n1 * n2 != n:
            raise ValueError("n1 must divide n")
        self.n1, self.n2 = n1, n2
        # generator w of order n; sub-NTTs use w^n1 (order n2) and w^n2
        self.w_root = spec.find_generator(n, False)
        from ..ops.bigmul import BigMul
        self.big = BigMul(spec)
        # forward pipeline from w; inverse pipeline (built lazily) is the
        # same four-step with root w^-1 plus a final 1/n scale:
        # IDFT(X)[i] = n^-1 * sum_k X[k] w^(-ik)
        self._pipes = {"fwd": self._build(self.w_root)}
        self._ninv = limb.ints_to_digits(
            [pow(n, spec.p - 2, spec.p)], spec.w)[:, 0]
        self._fwd = None
        self._inv = None

    def _build(self, root: int):
        """Sub-plans + twiddle grid + DFT-order fixes for one direction
        (root = w for forward, w^-1 for inverse)."""
        spec, n1, n2 = self.spec, self.n1, self.n2
        p = spec.p
        import os

        mode = os.environ.get("RINGO_BIG_NTT", "auto")
        if mode not in ("auto", "stage", "matmul"):
            raise ValueError(
                f"RINGO_BIG_NTT={mode!r}: expected auto|stage|matmul")
        if mode == "matmul" or (mode == "auto" and spec.w >= 14):
            # wide fields: MXU matmul sub-transforms in true DFT order
            # (ops/bigntt_matmul) — the empirical order fix below then
            # resolves to the identity.  Same policy knob as
            # make_device_plan (RINGO_BIG_NTT=stage forces butterflies).
            from ..ops.bigntt_matmul import MatmulBigNTT
            sub2 = MatmulBigNTT(spec, n2, negacyclic=False,
                                generator=pow(root, n1, p), order="dft")
            sub1 = MatmulBigNTT(spec, n1, negacyclic=False,
                                generator=pow(root, n2, p), order="dft")
        else:
            sub2 = BigNTTDev(spec, n2, negacyclic=False)
            sub1 = BigNTTDev(spec, n1, negacyclic=False)
            # BigNTTDev picks its own generator; the four-step needs exactly
            # root^n1 / root^n2.  Rebuild the twiddle tables from root
            # directly for bit-stable semantics.
            sub2.tw, sub2.twinv, sub2.ninv = self._tables(pow(root, n1, p), n2)
            sub1.tw, sub1.twinv, sub1.ninv = self._tables(pow(root, n2, p), n1)
        # twiddle grid root^(i1*k2) as digit planes [w, n1, n2]
        flat = []
        for i1 in range(n1):
            acc = 1
            r = pow(root, i1, p)
            for k2 in range(n2):
                flat.append(acc)
                acc = acc * r % p
        tw_grid = limb.ints_to_digits(flat, spec.w).reshape(spec.w, n1, n2)
        # the stage engine's output ordering is an internal convention;
        # derive the permutation to TRUE DFT order empirically from an
        # impulse (DFT(e_1)[k] = root^k), so the composite is exactly
        # X[k] = sum_i x[i] root^(ik) in natural order
        ord2 = self._dft_order(sub2, pow(root, n1, p), n2)
        ord1 = self._dft_order(sub1, pow(root, n2, p), n1)
        return sub2, sub1, tw_grid, ord2, ord1

    def _dft_order(self, plan, root: int, m: int) -> np.ndarray:
        w = self.spec.w
        e = np.zeros((w, m), dtype=np.uint32)
        e[0, 1] = 1  # impulse at index 1 (value 1)
        out = limb.digits_to_ints(np.asarray(plan.fwd(e)))
        pos = {pow(root, k, self.spec.p): k for k in range(m)}
        perm = np.array([pos[v] for v in out], dtype=np.int64)
        inv = np.empty(m, dtype=np.int64)
        inv[perm] = np.arange(m)
        return inv

    def _tables(self, root: int, m: int):
        spec = self.spec
        tw, twinv, ninv = nttmod._tables_host(
            spec.p, spec.b, spec.k, m, False, generator=root)
        w = self.spec.w
        return (limb.ints_to_digits(tw, w), limb.ints_to_digits(twinv, w),
                limb.ints_to_digits([ninv], w)[:, 0])

    def _make_run(self, pipe, scale=None):
        """Four-step transform closure over one direction's tables; the
        final 1/n ``scale`` planes distinguish the inverse."""
        wsc = jax.lax.with_sharding_constraint
        mesh = self.mesh
        n1, n2, w = self.n1, self.n2, self.spec.w
        sub2, sub1, tw_grid, ord2, ord1 = pipe

        def run(x):
            import jax.numpy as jnp

            # natural -> grid [w, i1, i2] with x[i1 + n1*i2] at [i1, i2]
            g = jnp.transpose(x.reshape(w, n2, n1), (0, 2, 1))
            g = wsc(g, _ns(mesh, None, "sp", None))
            # step 1: n2-point NTTs along the local axis i2 (+ DFT-order
            # fix — a local gather)
            g = sub2.fwd(g)[:, :, ord2]
            # step 2: twiddles root^(i1*k2)
            g = self.big.mul_mod(g, tw_grid)
            # step 3+4: transpose (all-to-all) and n1-point NTTs
            g = jnp.transpose(g, (0, 2, 1))  # [w, k2, i1]
            g = wsc(g, _ns(mesh, None, "sp", None))
            g = sub1.fwd(g)[:, :, ord1]  # -> [w, k2, k1]
            # natural order X[k2 + n2*k1]: [w, k2, k1] -> transpose+reshape
            out = jnp.transpose(g, (0, 2, 1)).reshape(w, n1 * n2)
            if scale is not None:
                sc = np.asarray(scale).reshape(w, 1)
                out = self.big.mul_mod(out, jnp.asarray(sc)
                                       + jnp.zeros_like(out))
            return wsc(out, _ns(mesh, None, "sp"))

        return run

    def fwd_fn(self):
        """The jitted sharded transform [w, n] -> [w, n] (natural order)."""
        if self._fwd is None:
            self._fwd = jax.jit(self._make_run(self._pipes["fwd"]))
        return self._fwd

    def inv_fn(self):
        """The jitted sharded inverse transform (natural order, includes
        the 1/n scaling): exact inverse of ``fwd_fn``."""
        if self._inv is None:
            if "inv" not in self._pipes:
                w_inv = pow(self.w_root, self.spec.p - 2, self.spec.p)
                self._pipes["inv"] = self._build(w_inv)
            self._inv = jax.jit(self._make_run(self._pipes["inv"],
                                               scale=self._ninv))
        return self._inv

    def fwd(self, x):
        return self.fwd_fn()(x)

    def inv(self, x):
        return self.inv_fn()(x)
