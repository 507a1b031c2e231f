"""Device Horner evaluation vs host big-int reference."""

import numpy as np
import pytest

from ringo_tpu.fields import ZP255, limb
from ringo_tpu.fields.spec import REFERENCE_FIELDS
from ringo_tpu.ops.horner import HornerPlan


def _host_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


@pytest.mark.parametrize("field,n", [("zp255", 100), ("zp255", 257),
                                     ("zp110", 64), ("zp880", 33)])
def test_evaluate_many_matches_host(field, n):
    spec = REFERENCE_FIELDS[field]
    rng = np.random.default_rng(n)
    plan = HornerPlan(spec)
    vs, want = [], []
    x = int(rng.integers(1, 1 << 62))
    for t in range(3):
        ints = [int(v) % spec.p for v in rng.integers(0, 1 << 63, size=n - t)]
        ints = [(v * v * v) % spec.p for v in ints]  # spread over full range
        vs.append(limb.ints_to_digits(ints, spec.w))
        want.append(_host_eval(ints, x, spec.p))
    got = plan.evaluate_many(vs, x)
    assert got == want


def test_evaluate_edge_cases():
    spec = ZP255
    plan = HornerPlan(spec)
    p = spec.p
    # constant poly, zero poly, x = 0, coefficients at p-1
    vs = [limb.ints_to_digits([5], spec.w),
          limb.ints_to_digits([0, 0], spec.w),
          limb.ints_to_digits([p - 1, p - 1, p - 1], spec.w)]
    x = p - 1
    got = plan.evaluate_many(vs, x)
    assert got[0] == 5
    assert got[1] == 0
    assert got[2] == _host_eval([p - 1] * 3, x, p)
    assert plan.evaluate_many([limb.ints_to_digits([7, 9], spec.w)], 0) == [7]
