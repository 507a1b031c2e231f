import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ringo_tpu import backend
backend.use("jax")
import jax, jax.numpy as jnp
from ringo_tpu import jindo
from ringo_tpu.fields import ZP255
from ringo_tpu.ops import devconst

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 17
p = jindo.new_parameters(ZP255, 1 << logn, 1)
ring = p.ring_q
mm = ring._matmul_ntt()
L, d = ring.L, ring.d
n = (p.cols + 1) * p.rows
rng = np.random.default_rng(0)
res = rng.integers(0, np.array(ring.primes, dtype=np.uint64).reshape(-1,1,1), size=(L, n, d), dtype=np.uint64)
x = ring.from_u64(res)
xd = jnp.asarray(x)

def timeit(label, f, *a, reps=4):
    r = f(*a); _ = np.asarray(r[(0,)*(r.ndim-1)])  # warm + sync
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter(); r = f(*a); _ = np.asarray(r[(0,)*(r.ndim-1)]); ts.append(time.perf_counter()-t0)
    print(f"{label:30s} {min(ts)*1e3:8.2f} ms", flush=True)
    return r

tabs = devconst.device_tables([mm], jnp.asarray)
full = devconst.wrap(mm.ntt_mform, [mm], jax.jit, lambda: tabs)
timeit("full ntt_mform", full, xd)

planes = jnp.asarray(mm.fwd_planes)
v = (xd[0] | (xd[1] << jnp.uint32(16)))

@jax.jit
def split(v):
    return jnp.concatenate([(((v >> jnp.uint32(8*a)) & jnp.uint32(0xFF)).astype(jnp.int32)-128).astype(jnp.int8) for a in range(4)], axis=2)
xa = timeit("byte split", split, v)

@jax.jit
def dot(xa, planes):
    return jax.lax.dot_general(xa, planes, (((2,),(1,)), ((0,),(0,))), preferred_element_type=jnp.int32)
t_ = timeit("int8 dot", dot, xa, planes)

from ringo_tpu.ops.mac_matmul import recombine_mod_q
corr = jnp.asarray(mm.fwd_corr)
@jax.jit
def recomb(t):
    t = (t + corr).reshape(L, -1, 5, 1, d)
    return recombine_mod_q(ring, t, jnp)
timeit("recombine", recomb, t_)

@jax.jit
def fused(v, planes):
    xa = jnp.concatenate([(((v >> jnp.uint32(8*a)) & jnp.uint32(0xFF)).astype(jnp.int32)-128).astype(jnp.int8) for a in range(4)], axis=2)
    t = jax.lax.dot_general(xa, planes, (((2,),(1,)), ((0,),(0,))), preferred_element_type=jnp.int32)
    t = (t + corr).reshape(L, -1, 5, 1, d)
    return recombine_mod_q(ring, t, jnp)
timeit("split+dot+recombine fused", fused, v, planes)

# amortized: chain K async calls, one sync
def chain(label, f, x0, K=20, reps=3):
    r = f(x0); _ = np.asarray(r[(0,)*(r.ndim-1)])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        r = x0
        for _k in range(K):
            r = f(r)
        _ = np.asarray(r[(0,)*(r.ndim-1)])
        ts.append((time.perf_counter()-t0)/K)
    print(f"{label:30s} {min(ts)*1e3:8.3f} ms/call (K={K})", flush=True)

# fused NTT maps u32->u32 same shape: chainable
@jax.jit
def fused_pair(v):
    xa = jnp.concatenate([(((v >> jnp.uint32(8*a)) & jnp.uint32(0xFF)).astype(jnp.int32)-128).astype(jnp.int8) for a in range(4)], axis=2)
    t = jax.lax.dot_general(xa, planes, (((2,),(1,)), ((0,),(0,))), preferred_element_type=jnp.int32)
    t = (t + corr).reshape(L, -1, 5, 1, d)
    return recombine_mod_q(ring, t, jnp).reshape(L, -1, d)
chain("fused ntt (amortized)", fused_pair, v)

@jax.jit
def split_only(v):
    xa = jnp.concatenate([(((v >> jnp.uint32(8*a)) & jnp.uint32(0xFF)).astype(jnp.int32)) for a in range(4)], axis=2)
    return (xa[:, :, :d] | xa[:, :, d:2*d]).astype(jnp.uint32)
chain("byte split (amortized)", split_only, v)

# pure sync cost
@jax.jit
def ident(v):
    return v + jnp.uint32(1)
chain("v+1 (amortized)", ident, v)
t0 = time.perf_counter()
for _ in range(5):
    _ = np.asarray(ident(v)[0,0,0])
print(f"{'dispatch+pull RTT':30s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms", flush=True)
