"""MatmulBigNTT must be a bit-identical drop-in for BigNTTDev.

The stage engine (ops/bigntt.py) is itself pinned against the host
Montgomery NTT (tests/test_ntt.py), which mirrors the reference's
bigpoly transforms (/root/reference/math/bigpoly/ntt.go:144-244)."""

import random

import numpy as np
import pytest

from ringo_tpu.fields import limb
from ringo_tpu.fields.spec import ZP110, ZP255, ZP880
from ringo_tpu.ops.bigntt import BigNTTDev
from ringo_tpu.ops.bigntt_matmul import MatmulBigNTT


def _rand_planes(spec, n, batch, rng):
    xs = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(batch)]
    return np.stack([limb.ints_to_digits(r, spec.w) for r in xs], axis=1)


@pytest.mark.parametrize("spec,n,negacyclic", [
    (ZP110, 64, False), (ZP110, 64, True),
    (ZP255, 128, False), (ZP255, 128, True),
    (ZP880, 64, True),
])
def test_bit_identical_numpy(spec, n, negacyclic):
    rng = random.Random(5)
    ref = BigNTTDev(spec, n, negacyclic)
    mm = MatmulBigNTT(spec, n, negacyclic, leaf=16)
    x = _rand_planes(spec, n, 2, rng)
    f_ref = np.asarray(ref.fwd(x))
    f_mm = np.asarray(mm.fwd(x))
    assert np.array_equal(f_ref, f_mm)
    i_ref = np.asarray(ref.inv(f_ref))
    i_mm = np.asarray(mm.inv(f_ref))
    assert np.array_equal(i_ref, i_mm)
    assert np.array_equal(i_ref, x)   # round trip


@pytest.mark.parametrize("spec,n,negacyclic", [
    (ZP255, 256, False), (ZP880, 128, True),
])
def test_bit_identical_jax(spec, n, negacyclic):
    import jax
    import jax.numpy as jnp

    rng = random.Random(6)
    ref = BigNTTDev(spec, n, negacyclic)
    mm = MatmulBigNTT(spec, n, negacyclic, leaf=16)
    x = _rand_planes(spec, n, 1, rng)
    xj = jnp.asarray(x)
    f_ref = np.asarray(jax.jit(ref.fwd)(xj))
    f_mm = np.asarray(jax.jit(mm.fwd)(xj))
    assert np.array_equal(f_ref, f_mm)
    i_mm = np.asarray(jax.jit(mm.inv)(jnp.asarray(f_ref)))
    assert np.array_equal(i_mm, x)


@pytest.mark.parametrize("n", [4, 8, 32, 256, 2048])
@pytest.mark.parametrize("leaf", [4, 16])
@pytest.mark.parametrize("negacyclic", [False, True])
def test_size_leaf_sweep(n, leaf, negacyclic):
    """Recursion-structure sweep at zp110: n below/at/above the direct
    leaf, deep recursion, tail blocks of every flavor."""
    rng = random.Random(100 + n + leaf)
    spec = ZP110
    ref = BigNTTDev(spec, n, negacyclic)
    mm = MatmulBigNTT(spec, n, negacyclic, leaf=leaf)
    x = _rand_planes(spec, n, 1, rng)
    f = np.asarray(ref.fwd(x))
    assert np.array_equal(f, np.asarray(mm.fwd(x)))
    assert np.array_equal(x, np.asarray(mm.inv(f)))


def test_multi_level_recursion():
    """n = leaf^2 * 4 forces two twiddle levels plus a small tail leaf."""
    rng = random.Random(7)
    spec, n = ZP110, 1024
    ref = BigNTTDev(spec, n, False)
    mm = MatmulBigNTT(spec, n, False, leaf=16)
    x = _rand_planes(spec, n, 1, rng)
    assert np.array_equal(np.asarray(ref.fwd(x)), np.asarray(mm.fwd(x)))


def test_production_auto_selection_and_default_leaf():
    """The exact configuration wide-field rings get in production:
    make_device_plan auto-selection (w >= 14, rank >= 256) with the
    DEFAULT leaf (32) / leaf_direct (64) in engine order — bit-identical
    to the stage engine, and the env override switches engines."""
    import os

    from ringo_tpu.ops.bigntt_matmul import make_device_plan

    rng = random.Random(9)
    for spec, n in [(ZP255, 256), (ZP880, 512)]:
        plan = make_device_plan(spec, n, negacyclic=True)
        assert isinstance(plan, MatmulBigNTT)
        assert plan.leaf == 32 and plan.leaf_direct == 64
        ref = BigNTTDev(spec, n, True)
        x = _rand_planes(spec, n, 1, rng)
        f = np.asarray(ref.fwd(x))
        assert np.array_equal(f, np.asarray(plan.fwd(x)))
        assert np.array_equal(x, np.asarray(plan.inv(f)))
    # below the gate: stage engine
    assert isinstance(make_device_plan(ZP110, 64, False), BigNTTDev)
    # env override both ways + rejection of junk values
    os.environ["RINGO_BIG_NTT"] = "stage"
    try:
        assert isinstance(make_device_plan(ZP880, 512, False), BigNTTDev)
        os.environ["RINGO_BIG_NTT"] = "matmul"
        assert isinstance(make_device_plan(ZP110, 64, False), MatmulBigNTT)
        os.environ["RINGO_BIG_NTT"] = "bogus"
        with pytest.raises(ValueError):
            make_device_plan(ZP110, 64, False)
    finally:
        del os.environ["RINGO_BIG_NTT"]


def test_leaf_direct_tail():
    """n = leaf * 2*leaf: the tail block takes the doubled direct-leaf
    path (leaf_direct), saving a twiddle level."""
    rng = random.Random(8)
    spec, n = ZP110, 512
    ref = BigNTTDev(spec, n, False)
    mm = MatmulBigNTT(spec, n, False, leaf=16)
    assert mm.leaf_direct == 32
    x = _rand_planes(spec, n, 1, rng)
    assert np.array_equal(np.asarray(ref.fwd(x)), np.asarray(mm.fwd(x)))
    f = np.asarray(ref.fwd(x))
    assert np.array_equal(np.asarray(mm.inv(f)), x)
