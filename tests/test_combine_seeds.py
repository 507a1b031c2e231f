"""Batched challenge combine (jindo evaluate, reference prover.go:230-268):
the chunked batched-NTT + tree-fold program must match the per-opening
multiply-accumulate it replaced, across chunk boundaries."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ringo_tpu import backend, jindo  # noqa: E402
from ringo_tpu.fields import ZP255  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def jax_backend():
    backend.use("jax")
    yield
    backend.use("numpy")


def test_chunked_combine_matches_per_opening_oracle():
    t = 3
    params = jindo.new_parameters(ZP255, 1 << 8, t)
    prv = jindo.Prover(params, b"Jindo!", seed=b"combine-test")
    prv.combine_chunk = 2          # force a 2+1 chunk split
    stages = prv._get_stages()

    p = params
    ring, ring_out = p.ring_q, p.ring_q_out
    B, R, d = p.cols + 1, p.rows, p.degree
    K = p.mlwe_rank + p.in_msis_rank
    LO = ring_out.L
    dcmp = p.in_com_dcmp_len

    rng = np.random.default_rng(42)
    e_all = rng.integers(-1000, 1000, (t, B, R, d)).astype(np.int64)
    nz_all = rng.integers(-6, 7, (t, B, K, d)).astype(np.int64)
    ics = rng.integers(0, 1 << 16, (t, 2, LO, dcmp, d)).astype(np.uint32)
    bos = rng.integers(0, 1 << 16, (t, 2, LO, d)).astype(np.uint32)
    bqs = rng.integers(0, 1 << 16, (t, 2, ring.L, d)).astype(np.uint32)

    got = [np.asarray(x) for x in stages["combine_seeds"](
        jnp.asarray(e_all), jnp.asarray(nz_all), jnp.asarray(ics),
        jnp.asarray(bos), jnp.asarray(bqs))]

    # per-opening oracle (the scan semantics this replaced)
    acc = None
    for i in range(t):
        enc, ml = stages["seeds_encode"](jnp.asarray(e_all[i]),
                                         jnp.asarray(nz_all[i]))
        tic = ring_out.mul_mont(ics[i], bos[i][:, :, None, :])
        ten = ring.mul_mont(np.asarray(enc), bqs[i][:, :, None, None, :])
        tml = ring.mul_mont(np.asarray(ml), bqs[i][:, :, None, None, :])
        if acc is None:
            acc = [tic, ten, tml]
        else:
            acc = [ring_out.add(acc[0], tic), ring.add(acc[1], ten),
                   ring.add(acc[2], tml)]
    for g, w in zip(got, acc):
        assert np.array_equal(g, np.asarray(w))
