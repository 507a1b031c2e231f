"""BigLinMap: exact int8-matmul linear maps over big prime fields.

Oracle: Python-int matrix application mod p (the semantics of the
reference's generated `mulVec`/`innerProdVec` kernels,
/root/reference/jindo/internal/zp/vector.go:304-359, generalized to a
fixed matrix)."""

import random

import numpy as np
import pytest

from ringo_tpu.fields import limb
from ringo_tpu.fields.spec import ZP110, ZP255, ZP880
from ringo_tpu.ops.biglinmap import BigLinMap


def _oracle(W, xs, p):
    return [sum(Wi[j] * xs[j] for j in range(len(xs))) % p for Wi in W]


@pytest.mark.parametrize("spec,no,ni", [(ZP110, 8, 16), (ZP255, 5, 8),
                                        (ZP880, 4, 8)])
def test_matches_python_ints_numpy(spec, no, ni):
    rng = random.Random(11)
    W = [[rng.randrange(spec.p) for _ in range(ni)] for _ in range(no)]
    lm = BigLinMap(spec, W)
    xs = [rng.randrange(spec.p) for _ in range(ni)]
    x = limb.ints_to_digits(xs, spec.w)
    got = limb.digits_to_ints(np.asarray(lm.apply(x)))
    assert got == _oracle(W, xs, spec.p)


@pytest.mark.parametrize("spec", [ZP110, ZP880])
def test_matches_python_ints_jax_batched(spec):
    import jax.numpy as jnp

    rng = random.Random(12)
    no, ni, batch = 6, 8, 3
    W = [[rng.randrange(spec.p) for _ in range(ni)] for _ in range(no)]
    lm = BigLinMap(spec, W)
    xs = [[rng.randrange(spec.p) for _ in range(ni)] for _ in range(batch)]
    x = np.stack([limb.ints_to_digits(r, spec.w) for r in xs], axis=1)
    y = np.asarray(lm.apply(jnp.asarray(x)))
    for bi in range(batch):
        got = limb.digits_to_ints(y[:, bi, :])
        assert got == _oracle(W, xs[bi], spec.p)


def test_edge_values(ZP=ZP255):
    """Zero rows/inputs, p-1 everywhere (the max-magnitude corner)."""
    ni = 4
    W = [[0] * ni, [ZP.p - 1] * ni, [1] + [0] * (ni - 1)]
    lm = BigLinMap(ZP, W)
    xs = [ZP.p - 1] * ni
    x = limb.ints_to_digits(xs, ZP.w)
    got = limb.digits_to_ints(np.asarray(lm.apply(x)))
    assert got == _oracle(W, xs, ZP.p)


def test_guard_rejects_oversized_contraction():
    with pytest.raises(ValueError):
        BigLinMap(ZP880, [[1] * 2048] * 2)
