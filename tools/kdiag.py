"""Diagnose the matmul-NTT kernel: raw int8 dot vs byte-split vs recombine."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ringo_tpu import backend
backend.use("jax")
import jax, jax.numpy as jnp
from ringo_tpu import jindo
from ringo_tpu.fields import ZP255
from ringo_tpu.ops import devconst

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 19
p = jindo.new_parameters(ZP255, 1 << logn, 1)
ring = p.ring_q
mm = ring._matmul_ntt()
L, d = ring.L, ring.d
n = (p.cols + 1) * p.rows
rng = np.random.default_rng(0)
res = rng.integers(0, np.array(ring.primes, dtype=np.uint64).reshape(-1,1,1), size=(L, n, d), dtype=np.uint64)
x = ring.from_u64(res)
xd = jnp.asarray(x)
print(f"L={L} d={d} n={n}")

def timeit(label, f, *a, reps=5):
    r = jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{label:30s} {min(ts)*1e3:8.2f} ms", flush=True)
    return r

tabs = devconst.device_tables([mm], jnp.asarray)
full = devconst.wrap(mm.ntt_mform, [mm], jax.jit, lambda: tabs)
timeit("full ntt_mform", full, xd)

planes = jnp.asarray(mm.fwd_planes)   # [L, 4d, 5d] int8
v = (xd[0] | (xd[1] << jnp.uint32(16)))  # [L, n, d]

@jax.jit
def split(v):
    return jnp.concatenate([(((v >> jnp.uint32(8*a)) & jnp.uint32(0xFF)).astype(jnp.int32)-128).astype(jnp.int8) for a in range(4)], axis=2)
xa = timeit("byte split", split, v)

@jax.jit
def dot(xa, planes):
    return jax.lax.dot_general(xa, planes, (((2,),(1,)), ((0,),(0,))), preferred_element_type=jnp.int32)
t_ = timeit("int8 dot [L,n,4d]@[L,4d,5d]", dot, xa, planes)

@jax.jit
def dot_bf16(xa, planes):
    return jax.lax.dot_general(xa.astype(jnp.bfloat16), planes.astype(jnp.bfloat16), (((2,),(1,)), ((0,),(0,))), preferred_element_type=jnp.float32)
timeit("bf16 dot (same shape)", dot_bf16, xa, planes)

from ringo_tpu.ops.mac_matmul import recombine_mod_q
corr = jnp.asarray(mm.fwd_corr)
@jax.jit
def recomb(t):
    t = (t + corr).reshape(L, -1, 5, 1, d)
    return recombine_mod_q(ring, t, jnp)
timeit("recombine", recomb, t_)
