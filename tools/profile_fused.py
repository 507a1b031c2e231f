"""Split the fused commit program into cumulative prefixes to locate time.
Run: python tools/profile_fused.py [logn]"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from ringo_tpu import backend
backend.use("jax")
import jax, jax.numpy as jnp
from ringo_tpu.fields import ZP255
from ringo_tpu.jindo.prover import Prover, sample_field_digits
from ringo_tpu.jindo.params import new_parameters
from ringo_tpu.csprng.gaussian import TwinCDTDevice
from ringo_tpu.csprng import chacha

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 19
spec = ZP255
p = new_parameters(spec, 1 << logn, 1)
pr = Prover(p, b"Jindo!", seed=b"pf")
v = sample_field_digits(spec, 1 << logn, pr.uniform)
stages = pr._get_stages()
raw = pr._raw_stages
# build args exactly like _commit_fused_path
heads = [np.asarray(v[:, :p.cols * p.slots])]
meta = pr._meta(heads[0], v.shape[1])
side = pr._host_side_meta(*meta)
dev = backend.to_device
e_all = jax.block_until_ready(pr._assemble_stage(v.shape[1])(
    dev(v.astype(np.uint16)), dev(meta[0]), dev(meta[1]), dev(meta[3])))
args = (e_all, dev(side[3]), dev(side[4]), dev(side[0]), dev(side[2]),
        dev(side[1]), dev(side[5])) + pr.ck_device()

B, R, S = p.cols + 1, p.rows, p.slots
BR, d, K = B * R, p.degree, p.mlwe_rank + p.in_msis_rank
CAP = pr.FIX_CAP
twin_ecd, twin_ml, ecd = pr._twin_ecd, TwinCDTDevice(p.mlwe_std_dev), pr.ecd
ring = p.ring_q

def front(upto, e_all, key_enc, key_ml, default_lanes, c_sub, oidx, noise_mask, pk_inml, pk_out):
    xp = jnp
    e_all = e_all.astype(xp.uint32)
    w_enc = chacha.keystream_u32(key_enc, -(-BR * d // 8), xp=xp).reshape(-1)
    u_enc = (w_enc[0::2][:BR*d].astype(xp.uint64) | (w_enc[1::2][:BR*d].astype(xp.uint64) << xp.uint64(32))).reshape(BR, d)
    u_ml = chacha.keystream_u64(key_ml, p.cols * K * d, xp=xp).reshape(p.cols, K, d)
    if upto == "chacha":
        return u_enc, u_ml
    coeffs = ecd.base_digits(e_all)
    centers = ecd.drift_centers(coeffs)
    if upto == "digits":
        return coeffs, centers
    prov, agree, c_floor, c_frac, v0, v1 = twin_ecd.search(centers, u_enc)
    prov_ml, *_ = twin_ml.search(None, u_ml, zero_center=True)
    if upto == "search":
        return prov, prov_ml, agree
    bad = ((~agree) & default_lanes[:, None]).reshape(-1)
    n_bad = bad.sum(dtype=xp.int32)
    (idx,) = xp.nonzero(bad, size=CAP, fill_value=BR*d)
    safe = xp.minimum(idx, BR*d - 1)
    if upto == "nonzero":
        return idx, n_bad
    g = lambda a: xp.take(a.reshape(-1), safe)
    if upto == "gather":
        return g(c_frac), g(u_enc), g(v0), g(v1), g(c_floor), n_bad
    fv = twin_ecd.resolve_device(xp, g(c_frac), g(u_enc), g(v0), g(v1), g(c_floor))
    if upto == "resolve":
        return fv, n_bad
    c_other = xp.zeros((BR, d), dtype=xp.int64).at[oidx].set(c_sub, mode="drop")
    cc = xp.where(default_lanes[:, None], prov, c_other)
    cf = cc.reshape(-1).at[idx].set(fv, mode="drop")
    e_i64 = ecd.correction_total(coeffs, cf.reshape(BR, d)).reshape(B, R, d)
    noise = xp.concatenate([prov_ml, noise_mask[None]], axis=0)
    if upto == "prep":
        return e_i64, noise, n_bad
    enc = ring.ntt_mform(ring.embed_int64(e_i64))
    mlwe = ring.ntt_mform(ring.embed_int64(noise))
    if upto == "encntt":
        return enc[0,0,0,0], mlwe[0,0,0,0], n_bad
    raise ValueError(upto)

def sync(r):
    while isinstance(r, tuple): r = r[0]
    return float(jnp.sum(r[(0,)*(r.ndim-1)][:1].astype(jnp.float64))) if hasattr(r, 'ndim') and r.ndim else float(r)

import functools
for upto in ("search", "nonzero", "gather", "resolve"):
    f = jax.jit(functools.partial(front, upto))
    r = f(*args); sync(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = f(*args); sync(r); ts.append(time.perf_counter()-t0)
    print(f"prefix {upto:8s}: {min(ts)*1e3:8.1f} ms", flush=True)

f = stages["commit_fused"]
r = f(*args); jax.block_until_ready(r)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); r = f(*args); _ = int(np.asarray(r[4])); ts.append(time.perf_counter()-t0)
print(f"full fused       : {min(ts)*1e3:8.1f} ms", flush=True)
