"""The Pallas twin-CDT search kernel must match the host binary search
bit-for-bit (run in interpreter mode on the CPU test mesh)."""

import numpy as np

import jax

from ringo_tpu.csprng.gaussian import TwinCDTDevice, TwinCDTGaussianSampler
from ringo_tpu.ops.twin_pallas import TwinSearchPallas


def test_kernel_matches_host_bsearch():
    rng = np.random.default_rng(3)
    host = TwinCDTGaussianSampler(12.000331, b"s")
    dev = TwinCDTDevice(12.000331)
    n = 5000
    c0 = rng.integers(0, 128, n).astype(np.int32)
    c1 = rng.integers(0, 128, n).astype(np.int32)
    u = rng.integers(0, 1 << 63, n).astype(np.uint64) * 2 + 1
    # boundary entropy: exact table hits and 24-bit-tie neighborhoods that
    # force the tier-2 exact recount
    u[:4] = [0, 1, (1 << 64) - 1, host.tables[5][10]]
    u[4] = host.tables[7][3] + 1
    u[5] = host.tables[7][3] - 1
    u[6] = (host.tables[9][2] >> np.uint64(40)) << np.uint64(40)  # tie top 24
    ps = TwinSearchPallas(dev)
    v0, v1 = jax.jit(lambda a, b, c: ps(a, b, c, interpret=True))(c0, c1, u)
    np.testing.assert_array_equal(np.asarray(v0),
                                  host._bsearch(c0.astype(np.int64), u))
    np.testing.assert_array_equal(np.asarray(v1),
                                  host._bsearch(c1.astype(np.int64), u))
