"""Benchmark driver: Jindo commit throughput on the reference's headline
configuration (jindo/jindo_test.go BenchmarkSingle).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is measured
against this framework's own host-numpy implementation of the identical
pipeline (the "CPU library" analogue of the Go reference), so >1 means the
TPU path beats a single-core CPU run of the same math.
"""

import argparse
import contextlib
import json
import os
import random
import signal
import sys
import time

import numpy as np


class SectionTimeout(Exception):
    pass


@contextlib.contextmanager
def budget(seconds: int):
    """SIGALRM budget around one bench section.  A section that hangs (e.g.
    a pathological compile through the axon remote helper) raises instead of
    eating the driver's whole timeout; note the alarm can only interrupt
    Python bytecode, so a single very long C call still runs to completion —
    the early JSON emission in main() bounds the damage either way."""
    def _raise(signum, frame):
        raise SectionTimeout()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


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


def bench_grid_headlines(emit=None):
    """The BENCHGRID headline set (VERDICT r2 item 10): commit/evaluate/
    verify at logN19, batched per-commit at t=16, and the measured MXU
    roofline fractions — so a regression in any of them shows up in
    BENCH_r*.json, not just the single commit number.

    Each section runs under its own SIGALRM budget and ``emit`` (when
    given) re-prints the cumulative JSON line after every section, so a
    hang or driver timeout mid-grid costs only the sections not yet run."""
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    import subprocess

    out = {}

    def entry(name, seconds):
        """Run one grid entry in a SUBPROCESS (a device OOM poisons the
        whole process's TPU arena, and the remote-compile helper can hang;
        isolation keeps one bad entry from destroying the rest) and return
        its parsed result dict, or None."""
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(here, "tools", "bench_grid.py"),
                 "--entry", name],
                capture_output=True, text=True, timeout=seconds, cwd=here)
            for line in r.stdout.splitlines():
                if line.startswith("RESULT "):
                    return json.loads(line[len("RESULT "):])
            print(f"# grid {name}: rc={r.returncode} "
                  f"{(r.stdout + r.stderr)[-400:]!r}", file=sys.stderr)
        except subprocess.TimeoutExpired:  # pragma: no cover
            print(f"# grid {name}: timeout {seconds}s", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# grid {name} failed: {e!r}", file=sys.stderr)
        return None

    single = entry("jindo_single_logN19", 1800)
    if single:
        out["logN19_commit_s"] = single["commit_s"]
        out["logN19_evaluate_s"] = single["evaluate_s"]
        out["logN19_verify_s"] = single["verify_s"]
    if emit is not None:
        emit(out)
    batch = entry("jindo_batch_logN19_t16", 2400)
    if batch:
        out["logN19_t16_commit_per_poly_s"] = batch["commit_per_poly_s"]
    if emit is not None:
        emit(out)
    roof = entry("roofline", 1200)
    if roof:
        out["mac_mxu_util_padded"] = roof["mac_kernel"]["mxu_util_padded"]
        out["mac_hbm_frac"] = roof["mac_kernel"]["hbm_frac"]
        out["ntt_mxu_util"] = roof["ntt_kernel"]["mxu_util"]
        out["ntt_hbm_frac"] = roof["ntt_kernel"]["hbm_frac"]
    if emit is not None:
        emit(out)
    bk = entry("buckler_pk_logN13_zp220", 1800)
    if bk:
        out["buckler_pk_13_220_prove_s"] = bk["prove_s"]
        out["buckler_pk_13_220_verify_s"] = bk["verify_s"]
    return out


def _probe_device(timeout_s: float = 120.0) -> bool:
    """True if jax can initialize its default backend within timeout_s.
    The axon TPU tunnel occasionally goes down for hours and device init
    then hangs forever — probe in a subprocess so the benchmark can fall
    back to CPU with an honest hardware tag instead of producing nothing."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=int(os.environ.get("BENCH_LOGN", 17)))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--baseline-log-n", type=int, default=None,
                    help="numpy baseline size (defaults to --log-n)")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--no-grid", action="store_true",
                    help="skip the logN19/t16/roofline headline grid")
    args = ap.parse_args()

    hardware = os.environ.get("BENCH_HW_TAG",
                              os.environ.get("JAX_PLATFORMS", "default"))
    if "BENCH_HW_TAG" not in os.environ and not _probe_device():
        # device init hangs (axon tunnel down) — re-exec in a clean CPU
        # environment (the axon sitecustomize must not load at all) so the
        # round still gets an honest, tagged metric line
        import subprocess

        print("# device init hung (axon tunnel down?) — re-running on "
              "CPU JAX; numbers are NOT TPU numbers", file=sys.stderr)
        here = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   BENCH_HW_TAG="cpu-fallback(tunnel-down)",
                   PYTHONPATH=here)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--log-n", str(min(args.log_n, 14)), "--no-grid",
               "--reps", str(args.reps)]
        if args.skip_baseline:
            cmd.append("--skip-baseline")
        elif args.baseline_log_n:
            cmd += ["--baseline-log-n", str(min(args.baseline_log_n, 12))]
        raise SystemExit(subprocess.run(cmd, env=env, cwd=here).returncode)

    t_tpu, warm, params = bench_commit(args.log_n, "jax", args.reps)
    print(f"# jax commit N=2^{args.log_n}: {t_tpu*1e3:.1f} ms "
          f"(warmup+compile {warm:.1f}s)", file=sys.stderr)

    value = (1 << args.log_n) / t_tpu  # committed coefficients per second

    def emit(extra, vs=1.0):
        """Print the driver JSON line NOW (the driver parses the LAST such
        line, so the headline survives any later hang/timeout — round 4's
        rc=124 produced no line at all) and flush."""
        print(json.dumps({
            "metric": f"jindo_commit_coeffs_per_sec_logN{args.log_n}",
            "value": value,
            "unit": "coeff/s",
            "vs_baseline": vs,
            "hardware": hardware,
            "warmup_compile_s": warm,
            **extra,
        }), flush=True)

    emit({})  # headline first — everything after only improves the record

    if args.skip_baseline:
        t_base = None
    else:
        bl = args.baseline_log_n or args.log_n
        t_base = None
        try:
            # fresh process-free numpy run (same process: backend switch is
            # safe because stage closures are rebuilt per Prover)
            with budget(900):
                t_base, _, _ = bench_commit(bl, "numpy", 1)
        except Exception as e:  # pragma: no cover
            print(f"# numpy baseline failed: {e!r}", file=sys.stderr)
        if t_base is not None:
            scale = (1 << args.log_n) / (1 << bl)
            t_base *= scale  # linear extrapolation if measured smaller
            print(f"# numpy baseline (log_n={bl}, scaled): "
                  f"{t_base*1e3:.1f} ms", file=sys.stderr)

    vs = (t_base / t_tpu) if t_base else 1.0
    emit({}, vs)

    if not args.no_grid:
        from ringo_tpu import backend
        backend.use("jax")
        extra = bench_grid_headlines(emit=lambda ex: emit(ex, vs))
        for k, v in extra.items():
            print(f"# {k}: {v:.4g}", file=sys.stderr)
        emit(extra, vs)


if __name__ == "__main__":
    main()
