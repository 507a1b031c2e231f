"""The Pallas twin-CDT search kernel must match the host binary search
bit-for-bit (run in interpreter mode on the CPU test mesh)."""

import numpy as np

import jax

from ringo_tpu.csprng.gaussian import TwinCDTGaussianSampler
from ringo_tpu.ops.twin_pallas import TwinSearchPallas


def test_kernel_matches_host_bsearch():
    rng = np.random.default_rng(3)
    host = TwinCDTGaussianSampler(12.000331, b"s")
    n = 5000
    c0 = rng.integers(0, 128, n).astype(np.int32)
    c1 = rng.integers(0, 128, n).astype(np.int32)
    u = rng.integers(0, 1 << 63, n).astype(np.uint64) * 2 + 1
    u[:4] = [0, 1, (1 << 64) - 1, host.tables[5][10]]  # boundary entropy
    ps = TwinSearchPallas(host.tables)
    v0, v1 = jax.jit(lambda a, b, c: ps(a, b, c, interpret=True))(c0, c1, u)
    np.testing.assert_array_equal(np.asarray(v0),
                                  host._bsearch(c0.astype(np.int64), u))
    np.testing.assert_array_equal(np.asarray(v1),
                                  host._bsearch(c1.astype(np.int64), u))
