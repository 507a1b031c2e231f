"""Throwaway-ish: break down jindo commit wall time per stage on the live backend."""
import os
import sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ringo_tpu import backend
backend.use("jax")
from ringo_tpu.fields.spec import REFERENCE_FIELDS
from ringo_tpu.jindo.params import new_parameters
from ringo_tpu.jindo.prover import Prover, sample_field_digits

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 17
spec = REFERENCE_FIELDS["zp255"]
p = new_parameters(spec, 1 << logn, 1)
pr = Prover(p, b"Jindo!", seed=b"profile")
v = sample_field_digits(spec, 1 << logn, pr.uniform)

import jax
stages = pr._get_stages()
dev = backend.to_device

def t(label, fn, n=3):
    # warmup
    r = fn(); jax.block_until_ready(r) if not isinstance(r, (tuple, list)) else [jax.block_until_ready(x) for x in r]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r) if not isinstance(r, (tuple, list)) else [jax.block_until_ready(x) for x in r]
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts)*1e3:9.1f} ms")
    return r

print(f"logN={logn} cols={p.cols} rows={p.rows} inR={p.in_msis_rank} L={p.ring_q.L} d={p.degree}")

t0 = time.perf_counter()
e_in, sigma, populated = pr._assemble(v)
hs = pr._host_side(e_in, sigma, populated)
e_flat, default_lanes, oidx_pad, c_sub, key_enc, key_ml, noise_mask = hs
print(f"{'host assemble+side':28s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

out = t("sample (dev)", lambda: stages["sample"](dev(e_flat), dev(key_enc), dev(key_ml), dev(default_lanes)))
coeffs, prov, prov_ml, packed = out
packed_h = np.asarray(packed)
t0 = time.perf_counter(); fixes = pr._resolve_packed(packed_h)
print(f"{'resolve (host)':28s} {(time.perf_counter()-t0)*1e3:9.1f} ms")
fix_idx, fix_val = fixes

args = (coeffs, prov, prov_ml, dev(c_sub), dev(oidx_pad), dev(default_lanes),
        dev(fix_idx.astype(np.int32)), dev(fix_val.astype(np.int32)), dev(noise_mask),
        *pr.ck_device())
t("commit_from_samples (dev)", lambda: stages["commit_from_samples"](*args))

# sub-stage breakdown of commit_core
raw = pr._raw_stages
ring, ring_out = p.ring_q, p.ring_q_out

# rebuild the sub-pieces mirroring commit_core internals
import jax.numpy as jnp
from ringo_tpu.rings.rns_device import CrtShiftEmbed
crt_in = CrtShiftEmbed(ring, ring_out, p.log_in_cutoff)
crt_out = CrtShiftEmbed(ring_out, ring_out, p.log_out_cutoff)

# get e_i64/noise from a jitted prep (stage_commit minus commit_core): emulate
B, R = p.cols + 1, p.rows
K = p.mlwe_rank + p.in_msis_rank
ecd = pr.ecd
@backend.jit
def prep(coeffs, prov, prov_ml, c_sub, oidx, default_lanes, fix_idx, fix_val, noise_mask):
    xp = jnp
    BR = B * R; d = p.degree
    c_other = xp.zeros((BR, d), dtype=xp.int64)
    c_other = c_other.at[oidx].set(c_sub, mode="drop")
    c = xp.where(default_lanes[:, None], prov, c_other)
    cf = c.reshape(-1)
    cf = cf.at[fix_idx].set(fix_val.astype(xp.int64), mode="drop")
    c = cf.reshape(BR, d)
    e_i64 = ecd.correction_total(coeffs, c).reshape(B, R, d)
    noise = xp.concatenate([prov_ml, noise_mask[None]], axis=0)
    return e_i64, noise

e_i64, noise = prep(coeffs, prov, prov_ml, dev(c_sub), dev(oidx_pad), dev(default_lanes),
                    dev(fix_idx.astype(np.int32)), dev(fix_val.astype(np.int32)), dev(noise_mask))
jax.block_until_ready(e_i64)
print(f"{'  (prep fix/scatter)':26s}", end=""); t("", lambda: prep(coeffs, prov, prov_ml, dev(c_sub), dev(oidx_pad), dev(default_lanes), dev(fix_idx.astype(np.int32)), dev(fix_val.astype(np.int32)), dev(noise_mask)))

ck_in_d, ck_mlwe_d, ck_out_d = pr.ck_device()
@backend.jit
def s_encode(e_i64, noise_i64):
    enc = ring.ntt_mform(ring.embed_int64(e_i64))
    mlwe = ring.ntt_mform(ring.embed_int64(noise_i64))
    return enc, mlwe
enc, mlwe = t("  encode NTTs", lambda: s_encode(e_i64, noise))

@backend.jit
def s_inner_mac(enc, mlwe, ck_in, ck_mlwe):
    mm = lambda a, b: ring.mul_mont(a[:, :, :, None, :], b[:, :, None, :, :])
    a1 = jnp.moveaxis(ck_in, 3, 0)
    b1 = jnp.moveaxis(enc, 3, 0)
    def mac_sum(mul, adder, ab):
        a_stack, b_stack = ab
        first = mul(a_stack[0], b_stack[0])
        out, _ = jax.lax.scan(lambda c, ab2: (adder(c, mul(ab2[0], ab2[1])), None), first, (a_stack[1:], b_stack[1:]))
        return out
    com = mac_sum(mm, ring.add, (a1, b1))
    if p.mlwe_rank:
        a2 = jnp.moveaxis(ck_mlwe, 3, 0)
        b2 = jnp.moveaxis(mlwe[:, :, :, :p.mlwe_rank, :], 3, 0)
        com = ring.add(com, mac_sum(mm, ring.add, (a2, b2)))
    com = ring.add(com, jnp.moveaxis(mlwe[:, :, :, p.mlwe_rank:, :], 3, 2))
    return ring.intt_imform(com)
com = t("  inner MAC scan + INTT", lambda: s_inner_mac(enc, mlwe, ck_in_d, ck_mlwe_d))

@backend.jit
def s_crt_in(com):
    ic = crt_in(com)
    ic = jnp.moveaxis(ic, 3, 2).reshape(2, ring_out.L, p.in_com_dcmp_len, p.degree)
    return ic
ic = t("  crt_in cutoff", lambda: s_crt_in(com))

@backend.jit
def s_outer(ic, ck_out):
    icn = ring_out.ntt_mform(ic)
    mm = lambda a, b: ring_out.mul_mont(a, b[:, :, None, :])
    def mac_sum(ab):
        a_stack, b_stack = ab
        first = mm(a_stack[0], b_stack[0])
        out, _ = jax.lax.scan(lambda c, ab2: (ring_out.add(c, mm(ab2[0], ab2[1])), None), first, (a_stack[1:], b_stack[1:]))
        return out
    acc = mac_sum((jnp.moveaxis(ck_out, 3, 0), jnp.moveaxis(icn, 2, 0)))
    return ring_out.intt_imform(acc)
acc = t("  outer NTT+MAC scan+INTT", lambda: s_outer(ic, ck_out_d))

@backend.jit
def s_crt_out(acc):
    return ring_out.ntt_mform(crt_out(acc))
t("  crt_out + final NTT", lambda: s_crt_out(acc))
