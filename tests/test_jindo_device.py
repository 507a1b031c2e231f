"""Jindo device verify path vs host path: same verdicts, accept and reject.

Runs only when a jax device is usable (skipped in the default numpy-backend
CI loop to keep it fast; the TPU/CPU jit path is exercised by the driver's
graft checks and the bench).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if not os.environ.get("RINGO_DEVICE_TESTS"):
    pytest.skip("set RINGO_DEVICE_TESTS=1 to run device verify tests",
                allow_module_level=True)


@pytest.fixture(scope="module")
def roundtrip():
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255, limb

    backend.use("jax")
    params = jindo.new_parameters(ZP255, 1 << 10, 1)
    prv = jindo.Prover(params, b"Jindo!", seed=b"devtest")
    rng = np.random.default_rng(3)
    v = limb.ints_to_digits(
        [int(u) for u in rng.integers(0, 1 << 62, size=1 << 10)], ZP255.w)
    com, op = prv.commit(v)
    x = 1234567890123456789
    ys, pf = prv.evaluate(x, [v], [com], [op])
    yield params, x, v, com, ys, pf
    backend.use("numpy")


def test_device_and_host_verify_agree(roundtrip):
    from ringo_tpu import backend, jindo

    params, x, v, com, ys, pf = roundtrip
    vrf = jindo.Verifier(params, b"Jindo!")
    backend.use("jax")
    assert vrf.verify(x, [com], ys, pf) is True
    backend.use("numpy")
    vrf2 = jindo.Verifier(params, b"Jindo!")
    assert vrf2.verify(x, [com], ys, pf) is True
    backend.use("jax")


@pytest.mark.parametrize("tamper", ["eval", "crs", "encode", "in_commit",
                                    "partial_mask"])
def test_device_verify_rejects(roundtrip, tamper):
    from ringo_tpu import backend, jindo

    params, x, v, com, ys, pf = roundtrip
    backend.use("jax")
    crs = b"Jindo!"
    ys2 = list(ys)
    pf2 = jindo.Proof.from_bytes(params, pf.to_bytes(params))
    if tamper == "eval":
        ys2[0] ^= 1
    elif tamper == "crs":
        crs = b"wrong"
    elif tamper == "encode":
        arr = np.asarray(pf2.encode).copy()
        arr[0, 0, 0, 0] ^= 1
        pf2.encode = arr
    elif tamper == "in_commit":
        arr = np.asarray(pf2.in_commit).copy()
        arr[0, 0, 0, 0] ^= 1
        pf2.in_commit = arr
    elif tamper == "partial_mask":
        arr = np.asarray(pf2.partial_mask).copy()
        arr[0, 0, 0] ^= 1
        pf2.partial_mask = arr
    vrf = jindo.Verifier(params, crs)
    assert vrf.verify(x, [com], ys2, pf2) is False


def test_cap_overflow_falls_back_to_host_path(roundtrip):
    """Force the resolver-cap overflow branch: the prover must redo the
    commit on the host-sampled path and still produce a verifying
    commitment (the fallback was previously untested under the jax
    backend)."""
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255, limb

    params, x, v, com, ys, pf = roundtrip
    backend.use("jax")
    prv = jindo.Prover(params, b"Jindo!", seed=b"capof")
    prv._get_stages()
    prv.FIX_CAP = -1  # every commit now "overflows"
    com2, op2 = prv.commit(v)
    vrf = jindo.Verifier(params, b"Jindo!")
    x2 = 777777777777
    ys2, pf2 = prv.evaluate(x2, [v], [com2], [op2])
    assert vrf.verify(x2, [com2], ys2, pf2) is True


def test_batched_commit_matches_sequential():
    """commit_many (one batched fused program, MAC n-axis = t*B) must be
    bit-identical to sequential commit() calls with the same per-commit
    sampler streams (same ChaCha keys => same entropy)."""
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255, limb

    backend.use("jax")
    try:
        params = jindo.new_parameters(ZP255, 1 << 9, 3)
        rng = np.random.default_rng(11)
        vs = [limb.ints_to_digits(
            [int(u) for u in rng.integers(0, 1 << 62, size=1 << 9)],
            ZP255.w) for _ in range(3)]
        prv_a = jindo.Prover(params, b"Jindo!", seed=b"bseq")
        prv_b = jindo.Prover(params, b"Jindo!", seed=b"bseq")
        seq = [prv_a.commit(v) for v in vs]
        bat = prv_b.commit_many(vs)
        for (cs, os_), (cb, ob) in zip(seq, bat):
            np.testing.assert_array_equal(np.asarray(cs.value),
                                          np.asarray(cb.value))
            np.testing.assert_array_equal(np.asarray(os_.in_commit),
                                          np.asarray(ob.in_commit))
            np.testing.assert_array_equal(np.asarray(os_.seeds[0]),
                                          np.asarray(ob.seeds[0]))
            np.testing.assert_array_equal(np.asarray(os_.seeds[1]),
                                          np.asarray(ob.seeds[1]))
        # the batch must also round-trip through evaluate/verify
        x = 98765432123456789
        ys, pf = prv_b.evaluate(x, vs, [c for c, _ in bat],
                                [o for _, o in bat])
        vrf = jindo.Verifier(params, b"Jindo!")
        assert vrf.verify(x, [c for c, _ in bat], ys, pf) is True
    finally:
        backend.use("numpy")


def test_batched_fused_commit_chunked_bit_equal():
    """HBM-chunked fused dispatches are bit-identical to the fully
    batched program (the chunking bounds HBM at large rank: t=8 at N=2^19
    exceeds v5e memory in one program)."""
    from ringo_tpu import backend, jindo
    from ringo_tpu.fields import ZP255, limb

    backend.use("jax")
    try:
        t = 5
        params = jindo.new_parameters(ZP255, 1 << 9, t)
        rng = np.random.default_rng(23)
        vs = [limb.ints_to_digits(
            [int(u) for u in rng.integers(0, 1 << 62, size=1 << 9)],
            ZP255.w) for _ in range(t)]
        prv_full = jindo.Prover(params, b"Jindo!", seed=b"chk")
        prv_chunk = jindo.Prover(params, b"Jindo!", seed=b"chk")
        prv_chunk._fuse_chunk = lambda t=1: 2
        full = prv_full.commit_many(vs)
        chunked = prv_chunk.commit_many(vs)
        for (cf, of), (cc, oc) in zip(full, chunked):
            np.testing.assert_array_equal(np.asarray(cf.value),
                                          np.asarray(cc.value))
            np.testing.assert_array_equal(np.asarray(of.in_commit),
                                          np.asarray(oc.in_commit))
    finally:
        backend.use("numpy")
