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
    """Force completion with a real host pull of ONE element (slice on
    device first — np.asarray of the full leaf would drag the whole
    tensor through the tunnel); jax.block_until_ready is a no-op on the
    axon tunnel platform."""
    leaf = __import__("jax").tree_util.tree_leaves(x)[0]
    if hasattr(leaf, "ndim") and leaf.ndim:
        leaf = leaf[(0,) * leaf.ndim]
    np.asarray(leaf)
    return x


def _timed_amortized(f, args, K: int = 10, reps: int = 3) -> float:
    """Median per-call seconds over K queued dispatches with ONE final
    pull: a single host sync through the tunnel costs 25-200 ms of RTT,
    so per-call sync timing would swamp millisecond kernels."""
    import time as _time

    _sync(f(*args))  # warm
    ts = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        for _k in range(K):
            r = f(*args)
        _sync(r)
        ts.append((_time.perf_counter() - t0) / K)
    return float(np.median(ts))


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
    t_mac = _timed_amortized(mac, (kp, xd))
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

    # matmul NTT at the commit's main shape: [2, L, B*R, d] — measures the
    # ring's production dispatch (the fused Pallas kernel on TPU)
    from ringo_tpu.ops import devconst

    owners = ring.devconst_owners()
    poly = rand_poly(B * p.rows)
    pd = jnp.asarray(poly)
    tabs = devconst.device_tables(owners, jnp.asarray)
    f = devconst.wrap(ring.ntt_mform, owners, jax.jit, lambda: tabs)
    t_ntt = _timed_amortized(f, (pd,))
    # ONE int8 [n, 4d] @ [4d, 5d] matmul per prime (d = 256 so both are
    # 128 multiples), int32 accumulation
    n_rows = B * p.rows
    ntt_macs = L * n_rows * (PIN * d) * (P7 * d)
    ntt_util = 2 * ntt_macs / t_ntt / V5E_INT8_OPS
    # fused-kernel traffic: u32 residues in + map planes + u32 out (the
    # int32 plane sums never leave VMEM in the Pallas path)
    ntt_bytes = (L * n_rows * d * 4
                 + L * PIN * d * P7 * d
                 + L * n_rows * d * 4)
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


def _entry_fns():
    """name -> zero-arg callable for every grid entry."""
    fns = {}
    for log_n in (13, 15, 17, 19):
        fns[f"jindo_single_logN{log_n}"] = (
            lambda log_n=log_n: bench_jindo_single(log_n))
    for t in (8, 16, 32):
        fns[f"jindo_batch_logN19_t{t}"] = (
            lambda t=t: bench_jindo_batch(19, t))
    for log_n, field in ((12, "zp110"), (13, "zp220"), (14, "zp440"),
                         (15, "zp880")):
        fns[f"buckler_pk_logN{log_n}_{field}"] = (
            lambda log_n=log_n, field=field: bench_buckler(log_n, field))
    fns["roofline"] = bench_rooflines
    return fns


def run_entry(name: str):
    """Run one entry in THIS process and print its JSON result (used by
    the per-entry subprocess)."""
    from ringo_tpu import backend
    backend.use("jax")
    out = _entry_fns()[name]()
    print("RESULT " + json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip t=16/32 and (15,880)")
    ap.add_argument("--out", default="BENCHGRID.json")
    ap.add_argument("--only", default=None,
                    help="comma list: single,batch,buckler,roofline "
                         "(sections) or exact entry names")
    ap.add_argument("--entry", default=None,
                    help="internal: run one entry in-process")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-entry subprocess timeout (s)")
    args = ap.parse_args()

    if args.entry:
        run_entry(args.entry)
        return

    # Orchestrator: one subprocess per entry.  A device OOM poisons the
    # whole process's TPU arena (every later allocation fails with
    # RESOURCE_EXHAUSTED), so isolation is correctness, not hygiene; the
    # persistent compile cache keeps re-init cheap.
    import subprocess
    import sys as _sys

    only = set(args.only.split(",")) if args.only else None
    sections = {
        "single": [f"jindo_single_logN{n}" for n in (13, 15, 17, 19)],
        "batch": [f"jindo_batch_logN19_t{t}"
                  for t in ((8,) if args.quick else (8, 16, 32))],
        "buckler": [f"buckler_pk_logN{n}_{f}" for n, f in
                    ((12, "zp110"), (13, "zp220"), (14, "zp440"))
                    + ((() if args.quick else ((15, "zp880"),)))],
        "roofline": ["roofline"],
    }
    names = []
    for sec, ns in sections.items():
        for n in ns:
            if only is None or sec in only or n in only:
                names.append(n)

    try:
        with open(args.out) as f:
            grid = json.load(f)
    except Exception:
        grid = {}
    grid["hardware"] = "1x TPU v5e (axon tunnel)"
    grid["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")

    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        print(f"== {name}", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(
                [_sys.executable, os.path.abspath(__file__),
                 "--entry", name],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=os.path.dirname(here))
            res = None
            for line in r.stdout.splitlines():
                if line.startswith("RESULT "):
                    res = json.loads(line[len("RESULT "):])
            if res is None:
                tail = (r.stdout + r.stderr)[-2000:]
                res = {"error": f"rc={r.returncode}: {tail}"}
        except subprocess.TimeoutExpired:
            res = {"error": f"timeout after {args.timeout}s"}
        res_meta = dict(res)
        res_meta["wall_s"] = round(time.time() - t0, 1)
        grid[name] = res_meta
        print(res_meta if "error" not in res_meta
              else {"error": res_meta["error"][:300]}, flush=True)
        with open(args.out, "w") as f:
            json.dump(grid, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
