"""Buckler PublicKey benchmark with span breakdown (reference
buckler_test.go:101-222 grid)."""
import os, random, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from ringo_tpu import backend, buckler
from ringo_tpu.fields.spec import REFERENCE_FIELDS
from ringo_tpu.rings.bigring import CyclotomicRing
from ringo_tpu.utils import profiling
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_buckler import PublicKeyCircuit, _Assignment, new_pk_instance

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
field = sys.argv[2] if len(sys.argv) > 2 else "zp220"
backend.use("jax")
spec = REFERENCE_FIELDS[field]
N = 1 << logn
c = PublicKeyCircuit()
c.ntt = buckler.NTTChecker(spec, N)
t0 = time.perf_counter()
prv, vrf = buckler.compile_circuit(spec, N, c, b"Buckler!", seed=b"bench")
print(f"compile_circuit: {time.perf_counter()-t0:.1f}s", flush=True)
rng = random.Random(77)
pk = new_pk_instance(spec, N, rng)
t0 = time.perf_counter(); pf = prv.prove(pk)
print(f"prove cold: {time.perf_counter()-t0:.1f}s", flush=True)
profiling.enable(True)
t0 = time.perf_counter(); pf = prv.prove(pk)
print(f"prove warm: {time.perf_counter()-t0:.2f}s", flush=True)
profiling.print_report()
profiling.reset()
t0 = time.perf_counter(); ok = vrf.verify(pk, pf)
print(f"verify cold: {ok} {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter(); ok = vrf.verify(pk, pf)
print(f"verify warm: {ok} {time.perf_counter()-t0:.2f}s", flush=True)
profiling.print_report()
