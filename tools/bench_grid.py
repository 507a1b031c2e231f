"""Full reference benchmark grid + per-kernel roofline accounting.

Measures every configuration the reference ships harnesses for
(jindo/jindo_test.go:54-141: single logN in {13,15,17,19} and batched
N=2^19 t in {8,16,32}; buckler/buckler_test.go:101-222: PublicKey at
(logN, logQ) in {(12,110),(13,220),(14,440),(15,880)}), on the live jax
backend, and writes BENCHGRID.json.

Roofline: for the two MXU kernels (Ajtai MAC contraction, matmul NTT) the
executed bf16 MACs are computed from the einsum shapes (including padding
to the 128-lane MXU tiles) and divided by the measured kernel time against
the v5e peak (197 TFLOP/s bf16, 819 GB/s HBM).

Usage: python tools/bench_grid.py [--quick] [--out BENCHGRID.json]
"""

import argparse
import json
import random
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_FLOPS = 197e12
V5E_INT8_OPS = 394e12   # int8 MXU path: 2x bf16 peak
V5E_HBM_BPS = 819e9


def _sync(x):
    import jax
    jax.block_until_ready(x)
    return x


def bench_jindo_single(log_n: int, reps: int = 3):
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255
    from ringo_tpu.jindo.prover import sample_field_digits

    spec = ZP255
    n = 1 << log_n
    params = jindo.new_parameters(spec, n, 1)
    prv = jindo.Prover(params, b"Jindo!", seed=b"grid")
    vrf = jindo.Verifier(params, b"Jindo!")
    v = sample_field_digits(spec, n, prv.uniform)

    out = {}
    c, o = prv.commit(v)
    _ = np.asarray(o.in_commit)
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        c, o = prv.commit(v)
        _ = np.asarray(c.value[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    out["commit_s"] = float(np.median(ts))

    x = 0x1234567890ABCDEF
    ys, pf = prv.evaluate(x, [v], [c], [o])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        ys, pf = prv.evaluate(x, [v], [c], [o])
        ts.append(time.perf_counter() - t0)
    out["evaluate_s"] = float(np.median(ts))

    ok = vrf.verify(x, [c], ys, pf)
    assert ok
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        ok = vrf.verify(x, [c], ys, pf)
        ts.append(time.perf_counter() - t0)
    assert ok
    out["verify_s"] = float(np.median(ts))
    return out


def bench_jindo_batch(log_n: int, t: int, reps: int = 2):
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255
    from ringo_tpu.jindo.prover import sample_field_digits

    spec = ZP255
    n = 1 << log_n
    params = jindo.new_parameters(spec, n, t)
    prv = jindo.Prover(params, b"Jindo!", seed=b"grid")
    vrf = jindo.Verifier(params, b"Jindo!")
    vs = [sample_field_digits(spec, n, prv.uniform) for _ in range(t)]

    out = {}
    pairs = prv.commit_many(vs)
    _ = np.asarray(pairs[-1][0].value[0, 0, 0, 0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        pairs = prv.commit_many(vs)
        _ = np.asarray(pairs[-1][0].value[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    out["commit_many_s"] = float(np.median(ts))
    out["commit_per_poly_s"] = out["commit_many_s"] / t

    coms = [c for c, _ in pairs]
    opens = [o for _, o in pairs]
    x = 0x1234567890ABCDEF
    ys, pf = prv.evaluate(x, vs, coms, opens)
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        ys, pf = prv.evaluate(x, vs, coms, opens)
        ts.append(time.perf_counter() - t0)
    out["evaluate_s"] = float(np.median(ts))

    ok = vrf.verify(x, coms, ys, pf)
    assert ok
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        ok = vrf.verify(x, coms, ys, pf)
        ts.append(time.perf_counter() - t0)
    assert ok
    out["verify_s"] = float(np.median(ts))
    return out


def bench_buckler(log_n: int, field: str, reps: int = 2):
    from ringo_tpu import buckler
    from ringo_tpu.fields.spec import REFERENCE_FIELDS

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_buckler import PublicKeyCircuit, new_pk_instance

    spec = REFERENCE_FIELDS[field]
    N = 1 << log_n
    c = PublicKeyCircuit()
    c.ntt = buckler.NTTChecker(spec, N)
    prv, vrf = buckler.compile_circuit(spec, N, c, b"Buckler!", seed=b"grid")
    rng = random.Random(77)
    pk = new_pk_instance(spec, N, rng)

    out = {}
    pf = prv.prove(pk)
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        pf = prv.prove(pk)
        ts.append(time.perf_counter() - t0)
    out["prove_s"] = float(np.median(ts))
    ok = vrf.verify(pk, pf)
    assert ok
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        ok = vrf.verify(pk, pf)
        ts.append(time.perf_counter() - t0)
    assert ok
    out["verify_s"] = float(np.median(ts))
    return out


def bench_rooflines(log_n: int = 19, reps: int = 10):
    """Time the two MXU kernels standalone and compute utilization."""
    import jax
    import jax.numpy as jnp
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255
    from ringo_tpu.ops import mac_matmul

    spec = ZP255
    p = jindo.new_parameters(spec, 1 << log_n, 1)
    ring = p.ring_q
    L, d = ring.L, ring.d
    J = p.in_msis_rank
    K = p.rows + p.mlwe_rank
    B = p.cols + 1
    rng = np.random.default_rng(0)

    def rand_poly(*shape):
        res = rng.integers(0, np.array(ring.primes, dtype=np.uint64).reshape(
            -1, *([1] * (len(shape) + 1))), size=(L, *shape, d),
            dtype=np.uint64)
        return ring.from_u64(res)

    key = rand_poly(J, K)
    x = rand_poly(K, B)
    kp = jax.jit(lambda k: mac_matmul.fold_key(ring, k, jnp))(
        jnp.asarray(key))
    xd = jnp.asarray(x)
    mac = jax.jit(lambda kp_, x_: mac_matmul.mod_mac(ring, kp_, x_, jnp))
    _sync(mac(kp, xd))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(mac(kp, xd))
        ts.append(time.perf_counter() - t0)
    t_mac = float(np.median(ts))
    P7, PIN = mac_matmul.P7, mac_matmul.IN_PLANES
    # ONE int8 dot_general [L,d,P7*J,PIN*K] @ [L,d,PIN*K,n] with int32
    # accumulation: count algorithmic and 128-tile-padded int8 MACs
    # against the v5e int8 peak (2x bf16)
    M, CK, Nn = P7 * J, PIN * K, B
    pad = lambda v: -(-v // 128) * 128
    algo_macs = L * d * M * CK * Nn
    pad_macs = L * d * pad(M) * pad(CK) * pad(Nn)
    hbm_bytes = (kp.nbytes                    # int8 key planes
                 + L * CK * Nn * d * 1        # int8 x planes
                 + L * d * M * Nn * 4)        # int32 plane sums out
    mac_util_algo = 2 * algo_macs / t_mac / V5E_INT8_OPS
    mac_util_pad = 2 * pad_macs / t_mac / V5E_INT8_OPS

    # matmul NTT at the commit's main shape: [2, L, B*R, d]
    from ringo_tpu.ops import devconst

    mm = ring._matmul_ntt()
    poly = rand_poly(B * p.rows)
    pd = jnp.asarray(poly)
    tabs = devconst.device_tables([mm], jnp.asarray)
    f = devconst.wrap(mm.ntt_mform, [mm], jax.jit, lambda: tabs)
    _sync(f(pd))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(f(pd))
        ts.append(time.perf_counter() - t0)
    t_ntt = float(np.median(ts))
    # ONE int8 [n, 4d] @ [4d, 5d] matmul per prime (d = 256 so both are
    # 128 multiples), int32 accumulation
    n_rows = B * p.rows
    ntt_macs = L * n_rows * (PIN * d) * (P7 * d)
    ntt_util = 2 * ntt_macs / t_ntt / V5E_INT8_OPS
    ntt_bytes = (L * n_rows * PIN * d         # int8 input planes
                 + mm.fwd_planes.nbytes       # int8 map
                 + L * n_rows * P7 * d * 4)   # int32 plane sums
    return {
        "mac_kernel": {
            "time_s": t_mac,
            "shape": {"L": L, "d": d, "J": J, "K": K, "B": B},
            "mxu_util_algorithmic": mac_util_algo,
            "mxu_util_padded": mac_util_pad,
            "hbm_frac": hbm_bytes / t_mac / V5E_HBM_BPS,
        },
        "ntt_kernel": {
            "time_s": t_ntt,
            "rows": n_rows,
            "mxu_util": ntt_util,
            "hbm_frac": ntt_bytes / t_ntt / V5E_HBM_BPS,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip t=16/32 and (15,880)")
    ap.add_argument("--out", default="BENCHGRID.json")
    ap.add_argument("--only", default=None,
                    help="comma list: single,batch,buckler,roofline")
    args = ap.parse_args()

    from ringo_tpu import backend
    backend.use("jax")

    only = set(args.only.split(",")) if args.only else None
    grid = {"hardware": "1x TPU v5e (axon tunnel)",
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}

    def want(k):
        return only is None or k in only

    def flush_grid():
        with open(args.out, "w") as f:
            json.dump(grid, f, indent=1)

    def entry(k, fn):
        """One grid entry: a failure records the error instead of killing
        the whole run, and the JSON is rewritten after every entry so a
        crash/timeout mid-grid still leaves everything measured so far."""
        print(f"== {k}", flush=True)
        try:
            grid[k] = fn()
        except Exception as e:  # pragma: no cover
            grid[k] = {"error": repr(e)}
        print(grid[k], flush=True)
        flush_grid()

    if want("single"):
        for log_n in (13, 15, 17, 19):
            entry(f"jindo_single_logN{log_n}",
                  lambda log_n=log_n: bench_jindo_single(log_n))

    if want("batch"):
        ts_list = (8,) if args.quick else (8, 16, 32)
        for t in ts_list:
            entry(f"jindo_batch_logN19_t{t}",
                  lambda t=t: bench_jindo_batch(19, t))

    if want("buckler"):
        cfgs = [(12, "zp110"), (13, "zp220"), (14, "zp440")]
        if not args.quick:
            cfgs.append((15, "zp880"))
        for log_n, field in cfgs:
            entry(f"buckler_pk_logN{log_n}_{field}",
                  lambda log_n=log_n, field=field:
                  bench_buckler(log_n, field))

    if want("roofline"):
        entry("roofline", bench_rooflines)

    flush_grid()
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
