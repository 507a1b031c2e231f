"""NTT correctness: evaluation-order pinning, inverse roundtrip, convolution,
and NTT-domain automorphism — all against exact Python-int references."""

import random

import numpy as np
import pytest

from ringo_tpu.fields import FieldOps, REFERENCE_FIELDS
from ringo_tpu.ops import ntt as nttmod

ZP255 = REFERENCE_FIELDS["zp255"]
ZP220 = REFERENCE_FIELDS["zp220"]


def poly_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


@pytest.mark.parametrize("nega", [True, False])
@pytest.mark.parametrize("n", [8, 64])
def test_eval_order(nega, n):
    spec = ZP255
    ops = FieldOps(spec)
    rng = random.Random(7)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    plan = nttmod.NTTPlan(spec, n, nega)
    out = ops.to_ints(nttmod.ntt_fwd(plan, ops.from_ints(coeffs)))
    br = nttmod.bit_reverse_permutation(n)
    if nega:
        psi = spec.find_generator(n, True)
        want = [poly_eval(coeffs, pow(psi, int(2 * br[i] + 1), spec.p), spec.p)
                for i in range(n)]
    else:
        g = spec.find_generator(n, False)
        want = [poly_eval(coeffs, pow(g, int(br[i]), spec.p), spec.p)
                for i in range(n)]
    assert out == want


@pytest.mark.parametrize("nega", [True, False])
def test_roundtrip_batched(nega):
    spec = ZP220
    ops = FieldOps(spec)
    rng = random.Random(8)
    n, batch = 128, 3
    vals = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(batch)]
    d = np.stack([np.asarray(ops.from_ints(v)) for v in vals], axis=1)  # [w,B,n]
    plan = nttmod.NTTPlan(spec, n, nega)
    back = nttmod.ntt_inv(plan, nttmod.ntt_fwd(plan, d))
    for i in range(batch):
        assert ops.to_ints(back[:, i, :]) == vals[i]


@pytest.mark.parametrize("nega", [True, False])
def test_convolution(nega):
    spec = ZP255
    ops = FieldOps(spec)
    rng = random.Random(9)
    n = 32
    a = [rng.randrange(spec.p) for _ in range(n)]
    b = [rng.randrange(spec.p) for _ in range(n)]
    plan = nttmod.NTTPlan(spec, n, nega)
    fa = nttmod.ntt_fwd(plan, ops.from_ints(a))
    fb = nttmod.ntt_fwd(plan, ops.from_ints(b))
    prod = ops.to_ints(nttmod.ntt_inv(plan, ops.mul(fa, fb)))
    want = [0] * n
    for i in range(n):
        for j in range(n):
            if i + j < n:
                want[i + j] = (want[i + j] + a[i] * b[j]) % spec.p
            else:
                s = 1 if not nega else -1
                want[i + j - n] = (want[i + j - n] + s * a[i] * b[j]) % spec.p
    assert prod == want


def test_aut_ntt_matches_coeff_aut():
    spec = ZP255
    ops = FieldOps(spec)
    rng = random.Random(10)
    n, idx = 64, 5
    a = [rng.randrange(spec.p) for _ in range(n)]
    plan = nttmod.NTTPlan(spec, n, True)
    # coefficient-domain automorphism
    dst, sign = nttmod.aut_coeff_maps(n, idx)
    want = [0] * n
    for i in range(n):
        want[int(dst[i])] = a[i] % spec.p if sign[i] > 0 else (-a[i]) % spec.p
    # NTT-domain permutation
    fa = nttmod.ntt_fwd(plan, ops.from_ints(a))
    perm = nttmod.aut_ntt_permutation(n, idx)
    fa_perm = np.asarray(fa)[:, perm]
    back = ops.to_ints(nttmod.ntt_inv(plan, fa_perm))
    assert back == want


def test_jax_ntt_matches_numpy():
    import jax
    import jax.numpy as jnp

    spec = ZP220
    ops = FieldOps(spec)
    rng = random.Random(11)
    n = 256
    a = [rng.randrange(spec.p) for _ in range(n)]
    plan = nttmod.NTTPlan(spec, n, True)
    d = ops.from_ints(a)
    out_np = np.asarray(nttmod.ntt_fwd(plan, d))
    out_j = np.asarray(jax.jit(lambda x: nttmod.ntt_fwd(plan, x))(jnp.asarray(d)))
    assert (out_np == out_j).all()
