"""Shard-scaling efficiency harness (BASELINE.json north star: >=70%
scaling efficiency 1 -> N chips at rank 2^16).

Times the sharded batched Jindo commit step (parallel/commit.py — the
dp/tp/sp program that dominates a Buckler prove) on a 1-device mesh vs the
full mesh, same total work, and reports

    efficiency = t_1dev / (t_Ndev * N)

On the virtual CPU mesh this is a plumbing smoke test (all "devices" share
one host's cores, so efficiency is meaningless); on a real multi-chip TPU
slice it is the scaling number.  Usage:

    python tools/bench_scaling.py [--log-n 16] [--t 8] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=16)
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255
    from ringo_tpu.parallel import build_sharded_commit, make_mesh

    backend.use("jax")
    devices = jax.devices()
    n_dev = len(devices)
    print(f"devices: {n_dev} x {devices[0].platform}", flush=True)

    params = jindo.new_parameters(ZP255, 1 << args.log_n, 1)
    prover = jindo.Prover(params, b"Jindo!", seed=b"scal")
    rng = np.random.default_rng(0)
    B, R = params.cols + 1, params.rows
    K = params.mlwe_rank + params.in_msis_rank
    d = params.degree
    e = rng.integers(-(1 << 20), 1 << 20, (args.t, B, R, d), dtype=np.int64)
    nz = rng.integers(-30, 31, (args.t, B, K, d), dtype=np.int64)
    ck = prover.ck_device()

    def bench(mesh):
        step = build_sharded_commit(prover, mesh)
        out = jax.block_until_ready(step(e, nz, *ck))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(step(e, nz, *ck))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = bench(make_mesh(1, devices=devices[:1]))
    print(f"1-device commit step (t={args.t}, N=2^{args.log_n}): {t1:.3f} s",
          flush=True)
    if n_dev > 1:
        tn = bench(make_mesh(n_dev, devices=devices))
        eff = t1 / (tn * n_dev)
        print(f"{n_dev}-device commit step: {tn:.3f} s — "
              f"scaling efficiency {eff:.1%}", flush=True)
    else:
        print("single device only — nothing to scale", flush=True)


if __name__ == "__main__":
    main()
