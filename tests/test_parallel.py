"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
batched commit step must be bit-identical to the single-device program.
(The reference has no distributed tests — SURVEY.md §4 calls for adding
shard-vs-single-device equality ones.)"""

import numpy as np
import pytest

import jax

from ringo_tpu import backend, jindo
from ringo_tpu.fields import ZP255
from ringo_tpu.parallel import build_sharded_commit, make_mesh


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    params = jindo.new_parameters(ZP255, 1 << 9, 1)
    prover = jindo.Prover(params, b"Jindo!", seed=b"par")
    yield params, prover
    backend.use("numpy")


def _inputs(params, t, seed=3):
    rng = np.random.default_rng(seed)
    B, R = params.cols + 1, params.rows
    K = params.mlwe_rank + params.in_msis_rank
    d = params.degree
    e = rng.integers(-(1 << 20), 1 << 20, (t, B, R, d), dtype=np.int64)
    noise = rng.integers(-30, 31, (t, B, K, d), dtype=np.int64)
    return e, noise


def test_mesh_factoring():
    m = make_mesh(8)
    assert m.shape == {"dp": 2, "tp": 2, "sp": 2}
    m = make_mesh(4)
    assert m.shape == {"dp": 2, "tp": 2, "sp": 1}
    m = make_mesh(1)
    assert m.shape == {"dp": 1, "tp": 1, "sp": 1}


def test_sharded_commit_matches_single_device(setup):
    params, prover = setup
    mesh = make_mesh(8)
    t = 4
    e, noise = _inputs(params, t)

    step = build_sharded_commit(prover, mesh)
    enc_s, mlwe_s, ic_s, out_s = jax.block_until_ready(
        step(e, noise, *prover.ck_device()))

    raw = prover.raw_stages()["commit_core"]
    ck = jax.tree_util.tree_map(np.asarray, tuple(prover.ck_device()))
    single = jax.jit(jax.vmap(raw, in_axes=(0, 0, None, None)),
                     device=jax.devices()[0])
    enc_1, mlwe_1, ic_1, out_1 = jax.block_until_ready(single(e, noise, *ck))

    np.testing.assert_array_equal(np.asarray(enc_s), np.asarray(enc_1))
    np.testing.assert_array_equal(np.asarray(mlwe_s), np.asarray(mlwe_1))
    np.testing.assert_array_equal(np.asarray(ic_s), np.asarray(ic_1))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))


def test_sharded_commit_uneven_batch(setup):
    """t not divisible by dp: GSPMD pads, results still exact."""
    params, prover = setup
    mesh = make_mesh(8)
    e, noise = _inputs(params, 3, seed=5)
    step = build_sharded_commit(prover, mesh)
    _, _, _, out_s = jax.block_until_ready(
        step(e, noise, *prover.ck_device()))

    raw = prover.raw_stages()["commit_core"]
    ck = jax.tree_util.tree_map(np.asarray, tuple(prover.ck_device()))
    single = jax.jit(jax.vmap(raw, in_axes=(0, 0, None, None)),
                     device=jax.devices()[0])
    _, _, _, out_1 = jax.block_until_ready(single(e, noise, *ck))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))


def test_sharded_evaluate_matches_single(setup):
    """Sharded batched partial/response stages equal the single-device path."""
    from ringo_tpu.parallel import build_sharded_evaluate

    params, prover = setup
    mesh = make_mesh(8)
    p = params
    rng = np.random.default_rng(9)
    t = 2
    L, d = p.ring_q.L, p.degree
    B, R = p.cols + 1, p.rows
    K = p.mlwe_rank + p.in_msis_rank

    def rand_poly(*shape):
        lo = rng.integers(0, 1 << 16, shape).astype(np.uint32)
        hi = rng.integers(0, 1 << 14, shape).astype(np.uint32)
        return np.stack([lo, hi])

    left = rand_poly(L, R, d)
    enc = np.stack([rand_poly(L, B, R, d) for _ in range(t)])
    mlwe = np.stack([rand_poly(L, B, K, d) for _ in range(t)])
    chals = rand_poly(L, p.cols, d)

    step = build_sharded_evaluate(prover, mesh)
    part_s, re_s, rm_s = jax.block_until_ready(step(left, enc, mlwe, chals))

    raws = prover.raw_stages()
    single_p = jax.jit(jax.vmap(raws["partial"], in_axes=(None, 0)),
                       device=jax.devices()[0])
    single_r = jax.jit(jax.vmap(raws["response"], in_axes=(None, 0, 0)),
                       device=jax.devices()[0])
    part_1 = jax.block_until_ready(single_p(left, enc))
    re_1, rm_1 = jax.block_until_ready(single_r(chals, enc, mlwe))

    np.testing.assert_array_equal(np.asarray(part_s), np.asarray(part_1))
    np.testing.assert_array_equal(np.asarray(re_s), np.asarray(re_1))
    np.testing.assert_array_equal(np.asarray(rm_s), np.asarray(rm_1))


def test_sharded_buckler_round_matches_single():
    """The sharded Buckler first-round step (encodes + embedding NTTs +
    jindo commit cores over dp/tp/sp) equals the single-device program."""
    from ringo_tpu import buckler
    from ringo_tpu.fields import ZP110
    from ringo_tpu.parallel import build_sharded_buckler_round

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    try:
        class TwoWitnessCircuit:
            def __init__(self):
                self.x = buckler.Witness()
                self.y = buckler.Witness()

            def define(self, ctx):
                c = buckler.ArithmeticConstraint()
                c.add_term(1, None, self.x)
                c.add_term(-1, None, self.y)
                ctx.add_arithmetic_constraint(c)

        prv, _ = buckler.compile_circuit(ZP110, 1 << 7, TwoWitnessCircuit(),
                                         b"par!", seed=b"sb")
        mesh = make_mesh(8)
        step = build_sharded_buckler_round(prv, mesh)

        rng = np.random.default_rng(12)
        t = 4
        jp = prv.jindo.params
        w = ZP110.w
        w_planes = rng.integers(0, 1 << 16,
                                (t, w, prv.ctx.rank), dtype=np.uint32) % 997
        blinds = rng.integers(0, 997, (t, w), dtype=np.uint32)
        B, R = jp.cols + 1, jp.rows
        K = jp.mlwe_rank + jp.in_msis_rank
        e = rng.integers(-1000, 1000, (t, B, R, jp.degree), dtype=np.int64)
        nz = rng.integers(-6, 7, (t, B, K, jp.degree), dtype=np.int64)
        pk = prv.jindo.ck_device()

        out_s = jax.block_until_ready(step(w_planes, blinds, e, nz, *pk))

        import ringo_tpu.parallel.buckler as pb
        raw = prv.jindo.raw_stages()["commit_core"]
        single = jax.jit(jax.vmap(raw, in_axes=(0, 0, None, None)),
                         device=jax.devices()[0])
        _, _, ic1, out1 = jax.block_until_ready(single(e, nz, *pk))
        np.testing.assert_array_equal(np.asarray(out_s[2]), np.asarray(ic1))
        np.testing.assert_array_equal(np.asarray(out_s[3]), np.asarray(out1))

        # encode half: compare against the unsharded encoder
        for i in range(t):
            want = prv.ecd.rand_encode(w_planes[i], blinds[i])
            np.testing.assert_array_equal(np.asarray(out_s[0][i]),
                                          np.asarray(want.coeffs))
            want_ntt = prv.poly_ring.ntt(want)
            np.testing.assert_array_equal(np.asarray(out_s[1][i]),
                                          np.asarray(want_ntt.coeffs))
    finally:
        backend.use("numpy")


def test_sharded_bigntt_true_dft():
    """Four-step coefficient-sharded big-field NTT (all-to-all between
    stages) equals the direct DFT and is consistent with the single-device
    engine up to its known output ordering."""
    from ringo_tpu.fields import ZP110
    from ringo_tpu.ops.bigntt import BigNTTDev
    from ringo_tpu.fields import limb as L
    from ringo_tpu.parallel.bigntt import ShardedBigNTT

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    try:
        spec = ZP110
        n = 256
        mesh = make_mesh(8)
        sh = ShardedBigNTT(spec, n, mesh, n1=16)
        rng = np.random.default_rng(21)
        vals = [int(v) % spec.p for v in rng.integers(0, 1 << 63, size=n)]
        x = L.ints_to_digits(vals, spec.w)
        got = L.digits_to_ints(np.asarray(jax.block_until_ready(sh.fwd(x))))

        # direct DFT reference with the same root
        p = spec.p
        w_root = spec.find_generator(n, False)
        pw = [1] * n
        for i in range(1, n):
            pw[i] = pw[i - 1] * w_root % p
        want = [sum(vals[i] * pw[(i * k) % n] for i in range(n)) % p
                for k in range(n)]
        assert got == want

        # consistency with the single-device engine: same multiset through
        # its impulse-derived ordering
        eng = BigNTTDev(spec, n, negacyclic=False)
        full = L.digits_to_ints(np.asarray(eng.fwd(x)))
        assert sorted(full) == sorted(got)
    finally:
        backend.use("numpy")


def test_sharded_bigntt_inverse():
    """inv_fn is the exact inverse of fwd_fn, equals the direct IDFT, and
    includes the 1/n scale."""
    from ringo_tpu.fields import ZP110
    from ringo_tpu.fields import limb as L
    from ringo_tpu.parallel.bigntt import ShardedBigNTT

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    try:
        spec = ZP110
        n = 256
        mesh = make_mesh(8)
        sh = ShardedBigNTT(spec, n, mesh, n1=16)
        rng = np.random.default_rng(22)
        vals = [int(v) % spec.p for v in rng.integers(0, 1 << 63, size=n)]
        x = L.ints_to_digits(vals, spec.w)

        # round trip
        back = L.digits_to_ints(np.asarray(
            jax.block_until_ready(sh.inv(sh.fwd(x)))))
        assert back == vals

        # direct IDFT with the same root
        p = spec.p
        w_inv = pow(sh.w_root, p - 2, p)
        ninv = pow(n, p - 2, p)
        got = L.digits_to_ints(np.asarray(jax.block_until_ready(sh.inv(x))))
        pw = [1] * n
        for i in range(1, n):
            pw[i] = pw[i - 1] * w_inv % p
        want = [ninv * sum(vals[k] * pw[(i * k) % n] for k in range(n)) % p
                for i in range(n)]
        assert got == want
    finally:
        backend.use("numpy")


def test_sharded_bigntt_wide_field_matmul_subplans():
    """At w >= 14 the four-step builds its sub-transforms on the MXU matmul
    engine (ops/bigntt_matmul, true-DFT order): same direct-DFT semantics
    and exact fwd/inv round trip."""
    from ringo_tpu.fields import ZP255
    from ringo_tpu.fields import limb as L
    from ringo_tpu.ops.bigntt_matmul import MatmulBigNTT
    from ringo_tpu.parallel.bigntt import ShardedBigNTT

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    try:
        spec = ZP255
        n = 256
        mesh = make_mesh(8)
        sh = ShardedBigNTT(spec, n, mesh, n1=16)
        assert isinstance(sh._pipes["fwd"][0], MatmulBigNTT)
        rng = np.random.default_rng(23)
        vals = [int(v) % spec.p for v in rng.integers(0, 1 << 63, size=n)]
        x = L.ints_to_digits(vals, spec.w)
        got = L.digits_to_ints(np.asarray(jax.block_until_ready(sh.fwd(x))))

        p = spec.p
        pw = [1] * n
        for i in range(1, n):
            pw[i] = pw[i - 1] * sh.w_root % p
        want = [sum(vals[i] * pw[(i * k) % n] for i in range(n)) % p
                for k in range(n)]
        assert got == want

        back = L.digits_to_ints(np.asarray(
            jax.block_until_ready(sh.inv(sh.fwd(x)))))
        assert back == vals
    finally:
        backend.use("numpy")


def test_sharded_full_buckler_prove_bit_equal():
    """The FULL Buckler prove pipeline over the mesh (sharded jindo commit
    and evaluate stages + the four-step sharded embedding NTT) produces a
    byte-identical proof to the single-device prover, and the sharded
    jindo verifier accepts it."""
    import random

    from ringo_tpu import buckler
    from ringo_tpu.fields import ZP128
    from ringo_tpu.parallel import shard_buckler_prover
    from ringo_tpu.rings.bigring import CyclotomicRing

    from test_buckler import PublicKeyCircuit, _Assignment

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    try:
        spec = ZP128
        n = 1 << 8

        class FullCircuit(PublicKeyCircuit):
            """Adds a squared-two-norm constraint so the prove exercises
            the sum-check rounds (quotient + remLo/remHi commits) too."""

            def define(self, ctx):
                super().define(ctx)
                ctx.add_sq_two_norm_constraint(self.noise, n)

        rng = random.Random(77)
        ring = CyclotomicRing(spec, n)
        sk = ring.from_ints([rng.randrange(3) - 1 for _ in range(n)])
        noise = ring.from_ints([rng.randrange(3) - 1 for _ in range(n)])
        sk_ntt, noise_ntt = ring.ntt(sk), ring.ntt(noise)
        pk0 = ring.from_ints([rng.randrange(spec.p) for _ in range(n)],
                             is_ntt=True)
        pk1 = ring.add(ring.mul(pk0, sk_ntt), noise_ntt)
        a = _Assignment(sk.coeffs, sk_ntt.coeffs, pk0.coeffs, pk1.coeffs,
                        noise.coeffs, noise_ntt.coeffs)

        def build():
            c = FullCircuit()
            c.ntt = buckler.NTTChecker(spec, n)
            return buckler.compile_circuit(spec, n, c, b"par-full",
                                           seed=b"full")

        prv1, _ = build()
        pf1 = prv1.prove(a)

        mesh = make_mesh(8)
        prv2, vrf2 = build()
        shard_buckler_prover(prv2, mesh, min_ntt_rank=n)  # force NTT shard
        assert prv2.poly_ring._sharded_ntt is not None
        pf2 = prv2.prove(a)

        assert pf2.to_bytes(prv2.params) == pf1.to_bytes(prv1.params)

        # sharded verifier replay (buckler verifier drives the sharded
        # jindo verifier through the same mesh)
        from ringo_tpu.parallel import shard_jindo_verifier
        shard_jindo_verifier(vrf2.jindo, mesh)
        pub = _Assignment(None, None, pk0.coeffs, pk1.coeffs, None, None)
        assert vrf2.verify(pub, pf2)
        bad = buckler.Proof.from_bytes(prv2.params, pf2.to_bytes(prv2.params))
        bad.evals[0] = (bad.evals[0] + 1) % spec.p
        assert not vrf2.verify(pub, bad)
    finally:
        backend.use("numpy")


def test_sharded_jindo_roundtrip_matches_single():
    """set_mesh on the jindo prover/verifier: commitments, evaluation
    proofs and verdicts are bit-identical to the unsharded programs."""
    from ringo_tpu.fields import limb as L
    from ringo_tpu.parallel import shard_jindo_prover, shard_jindo_verifier

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    backend.use("jax")
    try:
        params = jindo.new_parameters(ZP255, 1 << 9, 2)
        rng = np.random.default_rng(31)
        n = 1 << 9
        vs = [L.ints_to_digits(
            [int.from_bytes(rng.bytes(30), "little") % ZP255.p
             for _ in range(n)], ZP255.w) for _ in range(2)]
        x = 987654321

        prv1 = jindo.Prover(params, b"par-rt", seed=b"rt")
        pairs1 = prv1.commit_many(vs)
        ys1, pf1 = prv1.evaluate(x, vs, [c for c, _ in pairs1],
                                 [o for _, o in pairs1])

        mesh = make_mesh(8)
        prv2 = shard_jindo_prover(jindo.Prover(params, b"par-rt", seed=b"rt"),
                                  mesh)
        pairs2 = prv2.commit_many(vs)
        ys2, pf2 = prv2.evaluate(x, vs, [c for c, _ in pairs2],
                                 [o for _, o in pairs2])

        assert [int(y) for y in ys1] == [int(y) for y in ys2]
        for (c1, _), (c2, _) in zip(pairs1, pairs2):
            np.testing.assert_array_equal(np.asarray(c1.value),
                                          np.asarray(c2.value))
        assert pf1.to_bytes(params) == pf2.to_bytes(params)

        vrf = shard_jindo_verifier(jindo.Verifier(params, b"par-rt"), mesh)
        assert vrf.verify(x, [c for c, _ in pairs2], ys2, pf2)
        ys_bad = [int(ys2[0]) + 1, int(ys2[1])]
        assert not vrf.verify(x, [c for c, _ in pairs2], ys_bad, pf2)
    finally:
        backend.use("numpy")


def test_multihost_single_process_noops():
    """Multi-host helpers degenerate correctly on one process: init is a
    no-op returning index 0, bcast is the identity, barrier returns."""
    from ringo_tpu.parallel import (bcast_bytes, init_multihost,
                                    sync_global_devices)

    assert init_multihost() == 0
    assert bcast_bytes(b"challenge!", 10) == b"challenge!"
    sync_global_devices("t")
