"""Jindo PCS end-to-end round trips (reference jindo/jindo_test.go:16-52:
commit N=2^10 random polys, evaluate at random x, verify).  CRS fixed to
b"Jindo!" like the reference."""

import random

import numpy as np
import pytest

from ringo_tpu import jindo
from ringo_tpu.fields import ZP255, limb

CRS = b"Jindo!"


def _run_jindo(batch: int, n: int = 1 << 10):
    spec = ZP255
    rng = random.Random(100 + batch)
    params = jindo.new_parameters(spec, n, batch)
    vs = []
    for _ in range(batch):
        ints = [rng.randrange(spec.p) for _ in range(n)]
        vs.append(limb.ints_to_digits(ints, spec.w))

    prv = jindo.Prover(params, CRS, seed=b"test-seed")
    vrf = jindo.Verifier(params, CRS)

    coms, opens = [], []
    for v in vs:
        c, o = prv.commit(v)
        coms.append(c)
        opens.append(o)

    x = rng.randrange(spec.p)
    ys, pf = prv.evaluate(x, vs, coms, opens)

    # evaluations are correct Horner values
    for v, y in zip(vs, ys):
        coeffs = limb.digits_to_ints(v)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % spec.p
        assert acc == y

    assert vrf.verify(x, coms, ys, pf)

    # soundness smoke: tampered evaluation must fail
    bad = list(ys)
    bad[0] = (bad[0] + 1) % spec.p
    assert not vrf.verify(x, coms, bad, pf)


def test_jindo_single():
    _run_jindo(1)


def test_jindo_batch():
    _run_jindo(8)


def test_commit_key_deterministic():
    params = jindo.new_parameters(ZP255, 1 << 10, 1)
    a = jindo.CommitKey(params, CRS)
    b = jindo.CommitKey(params, CRS)
    assert (a.In == b.In).all() and (a.Out == b.Out).all()
    c = jindo.CommitKey(params, b"other")
    assert not (a.In == c.In).all()


def test_prover_safe_copy():
    """safe_copy shares params/commit key but draws independent sampler
    states (reference SafeCopy, jindo/prover.go:327-339): copies produce
    valid, distinct commitments; a seeded copy is reproducible."""
    import numpy as np

    from ringo_tpu import jindo
    from ringo_tpu.fields import ZP110, limb

    params = jindo.new_parameters(ZP110, 1 << 8, 1)
    prv = jindo.Prover(params, b"sc!", seed=b"orig")
    vrf = jindo.Verifier(params, b"sc!")
    rng = np.random.default_rng(2)
    n = 1 << 8
    v = limb.ints_to_digits(
        [int.from_bytes(rng.bytes(15), "little") % ZP110.p
         for _ in range(n)], ZP110.w)

    c1, o1 = prv.safe_copy(seed=b"a").commit(v)
    c2, o2 = prv.safe_copy(seed=b"b").commit(v)
    c3, _ = prv.safe_copy(seed=b"a").commit(v)
    # distinct randomness across copies; reproducible per seed
    assert not np.array_equal(np.asarray(c1.value), np.asarray(c2.value))
    np.testing.assert_array_equal(np.asarray(c1.value), np.asarray(c3.value))

    # each copy's commitment opens correctly through the shared key
    cp = prv.safe_copy(seed=b"a")
    c, o = cp.commit(v)
    x = 424242
    ys, pf = cp.evaluate(x, [v], [c], [o])
    assert vrf.verify(x, [c], ys, pf)
