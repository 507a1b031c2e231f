"""Wall-time breakdown of the FUSED jindo commit path on the live backend:
host meta/side, device assemble, fused dispatch, result pull — plus
evaluate and verify, using the RINGO_TRACE spans."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RINGO_TRACE", "1")
from ringo_tpu import backend, jindo
from ringo_tpu.utils import profiling
backend.use("jax")
from ringo_tpu.fields import ZP255
from ringo_tpu.jindo.prover import Prover, sample_field_digits

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 19
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spec = ZP255
p = jindo.new_parameters(spec, 1 << logn, 1)
pr = Prover(p, b"Jindo!", seed=b"profile")
vrf = jindo.Verifier(p, b"Jindo!")
v = sample_field_digits(spec, 1 << logn, pr.uniform)

t0 = time.perf_counter(); c, o = pr.commit(v); np.asarray(c.value[0,0,0,0])
print(f"commit warm(compile+load): {time.perf_counter()-t0:.1f}s", flush=True)
profiling.reset()
ts = []
for _ in range(reps):
    t0 = time.perf_counter(); c, o = pr.commit(v); np.asarray(c.value[0,0,0,0])
    ts.append(time.perf_counter() - t0)
print(f"commit: {min(ts)*1e3:.1f} ms (min of {reps})", flush=True)
profiling.print_report(); profiling.reset()

x = 0x1234567890ABCDEF
t0 = time.perf_counter(); ys, pf = pr.evaluate(x, [v], [c], [o])
print(f"evaluate warm: {time.perf_counter()-t0:.1f}s", flush=True)
profiling.reset()
ts = []
for _ in range(reps):
    t0 = time.perf_counter(); ys, pf = pr.evaluate(x, [v], [c], [o])
    ts.append(time.perf_counter() - t0)
print(f"evaluate: {min(ts)*1e3:.1f} ms", flush=True)
profiling.print_report(); profiling.reset()

t0 = time.perf_counter(); ok = vrf.verify(x, [c], ys, pf)
print(f"verify warm: {time.perf_counter()-t0:.1f}s ok={ok}", flush=True)
profiling.reset()
ts = []
for _ in range(reps):
    t0 = time.perf_counter(); ok = vrf.verify(x, [c], ys, pf)
    ts.append(time.perf_counter() - t0)
print(f"verify: {min(ts)*1e3:.1f} ms ok={ok}", flush=True)
profiling.print_report()
