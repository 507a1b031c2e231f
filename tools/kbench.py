"""Amortized kernel timing for the axon TPU tunnel.

The tunnel between host and TPU has a ~29 ms dispatch+pull floor and
dedups identical remote executions, so naive `block_until_ready` timing
measures latency, not compute (this is what round 2's BENCHGRID measured).
`time_loop` runs the kernel N times inside ONE jitted `fori_loop` — with a
per-iteration input perturbation so XLA cannot hoist or CSE the body —
pulls a single scalar, and subtracts the floor measured the same way with
zero iterations.  The result is the true per-call device time.

Usage:
    from tools.kbench import time_loop
    t = time_loop(kernel_fn, example_input)     # seconds per call

Run as a script for a machine-calibration report (MXU peaks, emulated-f64
cost, integer recombine primitive):
    JAX_PLATFORMS=axon python tools/kbench.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def time_loop(kernel, x, iters=20, reps=5):
    """Median amortized seconds per `kernel(x)` call on device.

    kernel: f(x) -> y for any pytree y; x a single array.  The loop body
    XORs a reduced scalar of y into a carry so every iteration is live.
    """
    def scalarize(y):
        # reduce over EVERY output element: anchoring liveness on a single
        # element lets XLA slice through elementwise ops (or a dot) and
        # compute only one lane, so the loop would time a sliver of the
        # kernel.  A wrapping integer sum forces the full computation.
        leaves = jax.tree_util.tree_leaves(y)
        s = None
        for l in leaves:
            v = l.ravel()
            if not jnp.issubdtype(v.dtype, jnp.integer):
                v = v.astype(jnp.float32).sum().astype(jnp.int32)
            else:
                v = v.astype(jnp.uint32).sum()
            v = v.astype(jnp.uint32)
            s = v if s is None else s ^ v
        return s

    @jax.jit
    def run(x, n):
        def body(i, carry):
            x, acc = carry
            xf = x.ravel()
            if jnp.issubdtype(xf.dtype, jnp.integer):
                pert = xf[0] ^ i.astype(xf.dtype)
            else:
                pert = xf[0] + (i % 2).astype(xf.dtype)
            xf = xf.at[0].set(pert)
            y = kernel(xf.reshape(x.shape))
            return (x, acc ^ scalarize(y))
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.uint32(0)))
        return acc

    def once(n):
        o = run(x, n)
        _ = int(np.asarray(o))  # compile + warm
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            o = run(x, n)
            _ = int(np.asarray(o))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_full = once(iters)
    t_zero = once(0)
    return max((t_full - t_zero) / iters, 1e-9)


def main():
    jax.config.update("jax_enable_x64", True)
    k0 = jax.random.PRNGKey(0)

    M = 4096
    a = jax.random.randint(k0, (M, M), 0, 127, jnp.int32)
    for name, arr, acc in [("bf16", a.astype(jnp.bfloat16), jnp.float32),
                           ("int8", a.astype(jnp.int8), jnp.int32)]:
        t = time_loop(lambda x, acc=acc: jax.lax.dot_general(
            x, x, (((1,), (0,)), ((), ())), preferred_element_type=acc), arr)
        print(f"{name} {M}^3 matmul: {t*1e3:.3f} ms -> "
              f"{2*M**3/t/1e12:.1f} TOP/s")

    n = 1 << 24
    q = 1073479681.0

    def barrett(y):
        m = jnp.floor(y * (1.0 / q))
        r = y - m * q
        r = jnp.where(r < 0, r + q, r)
        return jnp.where(r >= q, r - q, r)

    yf = jax.random.uniform(k0, (n,), jnp.float32) * 2**30
    t32 = time_loop(barrett, yf)
    print(f"f32 barrett 2^24: {t32*1e3:.3f} ms ({n/t32/1e9:.1f} Gelem/s)")
    yd = jnp.asarray(np.random.default_rng(0).uniform(0, 2**52, n))
    t64 = time_loop(barrett, yd)
    print(f"f64 barrett 2^24: {t64*1e3:.3f} ms ({n/t64/1e9:.1f} Gelem/s); "
          f"f64/f32 = {t64/t32:.1f}x")

    from ringo_tpu.fields import limb
    x2 = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 16, (2, n)).astype(np.uint32))
    qd = np.array([[33793], [16384]], dtype=np.uint32)
    t = time_loop(lambda x: limb.mont_mul(x, x, qd, 65535), x2)
    print(f"u32 mont_mul w=2 2^24: {t*1e3:.3f} ms ({n/t/1e9:.1f} Gelem/s)")

    # big-field NTT engines head to head: butterfly stages (VPU scans) vs
    # four-step with int8-matmul DFT blocks (MXU)
    from ringo_tpu.fields.spec import ZP880
    from ringo_tpu.ops.bigntt import BigNTTDev
    from ringo_tpu.ops.bigntt_matmul import MatmulBigNTT

    nn = 1 << 12
    rh = np.random.default_rng(2)
    vals = [int.from_bytes(rh.bytes(110), "little") % ZP880.p
            for _ in range(nn)]
    xb = jnp.asarray(limb.ints_to_digits(vals, ZP880.w))
    for nm, plan in [("stage", BigNTTDev(ZP880, nn, False)),
                     ("matmul", MatmulBigNTT(ZP880, nn, False))]:
        t = time_loop(plan.fwd, xb, iters=4, reps=3)
        print(f"bigntt-{nm} 880-bit n=2^12 fwd: {t*1e3:.1f} ms")


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
