"""Device polynomial evaluation over the big prime field.

Replaces the host big-int Horner loops (reference jindo/prover.go:318-323
``evals_i = Horner(v_i, x)`` and bigpoly/poly.go:60-70 ``Evaluate``): at
t=8, N=2^19 the host loop is 4.2M 255-bit multiplications on one CPU core.
Here the evaluation is three fully-vectorized device phases over plain
digit planes (ops/bigmul exact Barrett arithmetic):

1. powers  P[i] = x^i by doubling: P_{2m} = P_m ++ P_m * x^m — log2(n)
   vector muls totalling ~n elementwise muls (the step scalars x^(2^k) are
   host-computed Python ints, passed in as digit planes);
2. pointwise products v[i] * P[i] over all batch elements at once;
3. balanced-tree modular reduction (log2(n) halving adds).

Everything is exact mod p; the result digits are pulled (a few hundred
bytes) and converted to ints on host.
"""

from __future__ import annotations

import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec
from ..ops.bigmul import BigMul


def horner_eval_traced(big: BigMul, spec: FieldSpec, vs, step_pows, n: int):
    """Traceable evaluation body: vs [w, t, n] plain digits (u16/u32),
    step_pows [logn, w] digits of x^(2^k).  Returns [w, t] digits of
    v_i(x).  Shared by HornerPlan and the jindo response stage (which
    folds the evaluation into its own program to save a dispatch)."""
    w = spec.w
    pd = spec.p_digits.reshape(w, 1, 1)
    logn = max(1, (n - 1).bit_length())
    xp = limb.get_xp(vs)
    vs = vs.astype(xp.uint32)
    one = np.zeros((w, 1), dtype=np.uint32)
    one[0, 0] = 1
    P = xp.asarray(one) if xp is not np else one
    for k in range(logn):
        m = P.shape[1]
        if m >= n:
            break
        nxt = big.mul_mod(P, step_pows[k][:, None])
        P = xp.concatenate([P, nxt], axis=1)
    P = P[:, :n]
    prod = big.mul_mod(vs, P[:, None, :])  # [w, t, n]
    # balanced-tree modular sum over the coefficient axis
    cur = prod
    m = n
    while m > 1:
        half = m // 2
        lo = cur[:, :, :half]
        hi = cur[:, :, half:2 * half]
        s = limb.add(lo, hi, pd)
        if m % 2:
            s = xp.concatenate([s, cur[:, :, 2 * half:]], axis=2)
            m = half + 1
        else:
            m = half
        cur = s
    return cur[:, :, 0]


class HornerPlan:
    """Per-field evaluation plan; jitted per (t, n) shape."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.big = BigMul(spec)
        self._jits = {}

    def _fn(self, t: int, n: int):
        key = (t, n)
        if key not in self._jits:
            from .. import backend

            def run(vs, step_pows):
                return horner_eval_traced(self.big, self.spec, vs,
                                          step_pows, n)

            self._jits[key] = backend.jit(run)
        return self._jits[key]

    def steps_for(self, x: int, n: int) -> np.ndarray:
        """Host digits [logn, w] of x^(2^k)."""
        spec = self.spec
        logn = max(1, (n - 1).bit_length())
        steps = np.zeros((logn, spec.w), dtype=np.uint32)
        for k in range(logn):
            steps[k] = spec.to_digits_int(pow(x, 1 << k, spec.p))
        return steps

    def stack_inputs(self, vs_list, n: int):
        """Pad/stack value planes to [w, t, n] (device when any input is)."""
        from .. import backend

        w = self.spec.w
        t = len(vs_list)
        if backend.is_jax() and any(limb.get_xp(v) is not np
                                    for v in vs_list):
            import jax.numpy as jnp
            return jnp.stack(
                [jnp.pad(jnp.asarray(v).astype(jnp.uint32),
                         ((0, 0), (0, n - v.shape[1]))) for v in vs_list],
                axis=1)
        stacked = np.zeros((w, t, n), dtype=np.uint16)
        for i, v in enumerate(vs_list):
            stacked[:, i, :v.shape[1]] = np.asarray(v)
        return stacked

    def powers(self, x: int, n: int):
        """Device array [w, n] of plain digit planes of x^0..x^(n-1) (the
        same doubling construction the evaluator uses) — replaces host
        big-int loops building challenge-power vectors."""
        from .. import backend

        spec = self.spec
        w = spec.w
        key = ("pow", n)
        if key not in self._jits:
            big = self.big
            logn = max(1, (n - 1).bit_length())

            def run(step_pows):
                xp = limb.get_xp(step_pows)
                one = np.zeros((w, 1), dtype=np.uint32)
                one[0, 0] = 1
                P = xp.asarray(one) if xp is not np else one
                for k in range(logn):
                    if P.shape[1] >= n:
                        break
                    nxt = big.mul_mod(P, step_pows[k][:, None])
                    P = xp.concatenate([P, nxt], axis=1)
                return P[:, :n]

            self._jits[key] = backend.jit(run)
        logn = max(1, (n - 1).bit_length())
        steps = np.zeros((logn, w), dtype=np.uint32)
        for k in range(logn):
            steps[k] = spec.to_digits_int(pow(x, 1 << k, spec.p))
        return self._jits[key](backend.to_device(steps))

    def evaluate_many(self, vs_list, x: int) -> list[int]:
        """Evaluate several coefficient vectors (plain digit planes [w, n_i],
        host or device) at the same point x.  Returns Python ints."""
        from .. import backend
        from ..fields import limb

        if not vs_list:
            return []
        n = max(v.shape[1] for v in vs_list)
        t = len(vs_list)
        stacked = self.stack_inputs(vs_list, n)
        steps = self.steps_for(x, n)
        out = self._fn(t, n)(backend.to_device(stacked),
                             backend.to_device(steps))
        digits = np.asarray(out)  # [w, t]
        return [limb.digits_to_ints(digits[:, i:i + 1])[0] for i in range(t)]
