"""Benchmark driver: Jindo commit throughput on the reference's headline
configuration (jindo/jindo_test.go BenchmarkSingle).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is measured
against this framework's own host-numpy implementation of the identical
pipeline (the "CPU library" analogue of the Go reference), so >1 means the
TPU path beats a single-core CPU run of the same math.
"""

import argparse
import json
import os
import random
import sys
import time

import numpy as np


def bench_commit(log_n: int, backend_name: str, reps: int, seed: int = 7):
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255, limb

    backend.use(backend_name)
    spec = ZP255
    n = 1 << log_n
    rng = random.Random(seed)
    params = jindo.new_parameters(spec, n, 1)
    prv = jindo.Prover(params, b"Jindo!", seed=b"bench")
    v = limb.ints_to_digits([rng.randrange(spec.p) for _ in range(n)], spec.w)

    t0 = time.time()
    c, o = prv.commit(v)  # warmup incl. compile
    warm = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        c, o = prv.commit(v)
        times.append(time.time() - t0)
    return float(np.median(times)), warm, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=int(os.environ.get("BENCH_LOGN", 17)))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--baseline-log-n", type=int, default=None,
                    help="numpy baseline size (defaults to --log-n)")
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    t_tpu, warm, params = bench_commit(args.log_n, "jax", args.reps)
    print(f"# jax commit N=2^{args.log_n}: {t_tpu*1e3:.1f} ms "
          f"(warmup+compile {warm:.1f}s)", file=sys.stderr)

    if args.skip_baseline:
        t_base = None
    else:
        bl = args.baseline_log_n or args.log_n
        # fresh process-free numpy run (same process: backend switch is safe
        # because stage closures are rebuilt per Prover)
        t_base, _, _ = bench_commit(bl, "numpy", 1)
        scale = (1 << args.log_n) / (1 << bl)
        t_base *= scale  # linear extrapolation if measured smaller
        print(f"# numpy baseline (log_n={bl}, scaled): {t_base*1e3:.1f} ms",
              file=sys.stderr)

    value = (1 << args.log_n) / t_tpu  # committed coefficients per second
    vs = (t_base / t_tpu) if t_base else 1.0
    print(json.dumps({
        "metric": f"jindo_commit_coeffs_per_sec_logN{args.log_n}",
        "value": value,
        "unit": "coeff/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
