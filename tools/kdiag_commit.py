"""Amortized device timings of the fused-commit sub-stages at a given
logN — finds where the commit program's time actually goes.  Each piece
is jitted standalone and timed with K queued dispatches per host pull
(block_until_ready is a no-op on the axon tunnel)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ringo_tpu import backend  # noqa: E402

backend.use("jax")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ringo_tpu import jindo  # noqa: E402
from ringo_tpu.csprng import chacha  # noqa: E402
from ringo_tpu.csprng.gaussian import TwinCDTDevice  # noqa: E402
from ringo_tpu.fields import ZP255  # noqa: E402
from ringo_tpu.ops import devconst, mac_matmul  # noqa: E402

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 19
p = jindo.new_parameters(ZP255, 1 << logn, 1)
prv = jindo.Prover(p, b"Jindo!", seed=b"kd")
ring, ring_out = p.ring_q, p.ring_q_out
B, R, S = p.cols + 1, p.rows, p.slots
K = p.mlwe_rank + p.in_msis_rank
d = p.degree
BR = B * R
print(f"logN{logn}: B={B} R={R} d={d} K={K} lanes={BR*d/1e6:.2f}M", flush=True)

rng = np.random.default_rng(0)


def timed(label, f, *args, K_calls=8, reps=3):
    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        if hasattr(leaf, "ndim") and leaf.ndim:
            leaf = leaf[(0,) * leaf.ndim]
        np.asarray(leaf)

    jf = jax.jit(f)
    r = jf(*args)
    sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _k in range(K_calls):
            r = jf(*args)
        sync(r)
        ts.append((time.perf_counter() - t0) / K_calls)
    print(f"{label:32s} {min(ts)*1e3:8.2f} ms", flush=True)
    return r


# stage pieces mirrored from stage_commit_fused_batch
key = chacha.key_from_bytes(bytes(range(32)))
key_d = jnp.asarray(key)[None]
nb = -(-BR * d // 8)

with devconst.installed([], []):
    pass

ecd = prv.ecd
twin = TwinCDTDevice(p.ecd_std_dev)
tw_tabs = devconst.device_tables([twin], jnp.asarray)


def f_chacha(keys):
    return chacha.keystream_u32_batch(keys, nb, xp=jnp)


timed("chacha entropy (enc)", f_chacha, key_d)

e_all = rng.integers(0, 1 << 16, (ZP255.w, BR, S)).astype(np.uint32)
e_d = jnp.asarray(e_all)


def f_digits(e):
    return ecd.base_digits(e)


coeffs = timed("base_digits", f_digits, e_d)


def f_drift(c):
    return ecd.drift_centers(c)


centers = timed("drift_centers", f_drift, coeffs)

u = jnp.asarray(rng.integers(0, 1 << 63, (BR, d), dtype=np.uint64))


def f_twin(c, uu):
    with devconst.installed([twin], tw_tabs):
        return twin.search(c, uu)


timed("twin search (enc)", f_twin, centers, u)

c_prov = jnp.asarray(rng.integers(-40, 40, (BR, d), dtype=np.int64))


def f_corr(c, cc):
    return ecd.correction_total(c, cc)


timed("correction_total", f_corr, coeffs, c_prov)

e_i64 = jnp.asarray(rng.integers(-1000, 1000, (B, R, d), dtype=np.int64))
ow = ring.devconst_owners()
ring_tabs = devconst.device_tables(ow, jnp.asarray)


def f_ntt(e):
    with devconst.installed(ow, ring_tabs):
        return ring.ntt_mform(ring.embed_int64(e))


enc = timed("embed+ntt_mform (enc)", f_ntt, e_i64)

kin = np.concatenate([prv.ck.In, prv.ck.MLWE], axis=3)
pk = jax.jit(lambda k: (lambda pl: (pl, mac_matmul.fold_corr(pl)))(
    mac_matmul.fold_key(ring, k, jnp)))(jnp.asarray(kin))
KK = p.rows + p.mlwe_rank
x_all = jnp.asarray(rng.integers(0, 1 << 16, (2, ring.L, KK, B, d)
                                 ).astype(np.uint32))


def f_mac(pk_, x):
    return mac_matmul.mod_mac(ring, pk_, x, jnp)


com = timed("inner MAC", f_mac, pk, x_all)


def f_intt(c):
    with devconst.installed(ow, ring_tabs):
        return ring.intt_imform(c)


com_inv = timed("intt_imform (com)", f_intt, com)

from ringo_tpu.rings.rns_device import CrtShiftEmbed  # noqa: E402

crt_in = CrtShiftEmbed(ring, ring_out, p.log_in_cutoff)


def f_crt(c):
    return crt_in(c)


timed("crt cutoff (in)", f_crt, com_inv)
