import time, numpy as np, jax, jax.numpy as jnp
from ringo_tpu import backend
backend.use("jax")
from ringo_tpu.fields import ZP255
from ringo_tpu.jindo.prover import Prover, sample_field_digits
from ringo_tpu.jindo.params import new_parameters
from ringo_tpu.csprng.gaussian import TwinCDTDevice
from ringo_tpu.csprng import chacha
import sys
logn = int(sys.argv[1]) if len(sys.argv) > 1 else 19
spec = ZP255
p = new_parameters(spec, 1 << logn, 1)
pr = Prover(p, b"Jindo!", seed=b"profile")
v = sample_field_digits(spec, 1 << logn, pr.uniform)
raw = pr.raw_stages()
dev = backend.to_device
c, o = pr.commit(v); _ = np.asarray(o.in_commit)
e_in, sigma, populated = pr._assemble(v)
hs = pr._host_side(e_in, sigma, populated)
args = tuple(dev(hs[i]) for i in (0, 4, 5, 1, 3, 2, 6)) + pr.ck_device()
B, R, d = p.cols + 1, p.rows, p.degree
K = p.mlwe_rank + p.in_msis_rank
BR = B * R
CAP = pr.FIX_CAP
ecd, twin_ecd = pr.ecd, pr._twin_ecd
twin_ml = TwinCDTDevice(p.mlwe_std_dev)

def sync(x):
    while isinstance(x, (tuple, list)): x = x[0]
    return float(jnp.sum(x[(0,) * (x.ndim - 1)][:1].astype(jnp.float64)))

def bench(label, fn, *a):
    r = fn(*a); sync(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*a); sync(r); ts.append(time.perf_counter() - t0)
    print(f"{label:32s} {min(ts)*1e3:9.1f} ms", flush=True)
    return r

@jax.jit
def front(e_all, key_enc, key_ml, default_lanes, c_sub, oidx, noise_mask):
    xp = jnp
    w_enc = chacha.keystream_u32(key_enc, -(-BR * d // 8), xp=xp).reshape(-1)
    u_enc = (w_enc[0::2][:BR*d].astype(xp.uint64) | (w_enc[1::2][:BR*d].astype(xp.uint64) << xp.uint64(32))).reshape(BR, d)
    u_ml = chacha.keystream_u64(key_ml, p.cols * K * d, xp=xp).reshape(p.cols, K, d)
    coeffs = ecd.base_digits(e_all)
    centers = ecd.drift_centers(coeffs)
    prov, agree, c_floor, c_frac, v0, v1 = twin_ecd.search(centers, u_enc)
    prov_ml, *_ = twin_ml.search(None, u_ml, zero_center=True)
    bad = ((~agree) & default_lanes[:, None]).reshape(-1)
    (idx,) = xp.nonzero(bad, size=CAP, fill_value=BR*d)
    safe = xp.minimum(idx, BR*d - 1)
    g = lambda a: xp.take(a.reshape(-1), safe)
    fv = twin_ecd.resolve_device(xp, g(c_frac), g(u_enc), g(v0), g(v1), g(c_floor))
    c_other = xp.zeros((BR, d), dtype=xp.int64).at[oidx].set(c_sub, mode="drop")
    cc = xp.where(default_lanes[:, None], prov, c_other)
    cf = cc.reshape(-1).at[idx].set(fv, mode="drop")
    e_i64 = ecd.correction_total(coeffs, cf.reshape(BR, d)).reshape(B, R, d)
    noise = xp.concatenate([prov_ml, noise_mask[None]], axis=0)
    return e_i64, noise
fr = bench("front (sample+resolve+prep)", front, *args[:7])
e_i64, noise = fr
core = jax.jit(raw["commit_core"])
bench("commit_core", core, e_i64, noise, *pr.ck_device())
print("done", flush=True)
