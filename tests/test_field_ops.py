"""Element-method coverage of the field engine against Python-int semantics
(reference jindo/internal/zp element_test.go property tests: Inverse, Exp,
Sqrt, Legendre, BatchInvert, Halve, serialization)."""

import random

import numpy as np
import pytest

from ringo_tpu.fields import ZP128, ZP255
from ringo_tpu.fields.field_ops import FieldOps


@pytest.fixture(scope="module", params=[ZP128, ZP255], ids=["128b", "255b"])
def ops_vals(request):
    spec = request.param
    ops = FieldOps(spec)
    rng = random.Random(1)
    vals = [rng.randrange(spec.p) for _ in range(40)] + [0, 1, spec.p - 1]
    return ops, vals, ops.from_ints(vals)


def test_inverse_and_batch(ops_vals):
    ops, vals, a = ops_vals
    p = ops.spec.p
    inv = ops.to_ints(ops.inverse(a))
    for v, iv in zip(vals, inv):
        assert (v * iv) % p == 1 if v else iv == 0
    assert ops.to_ints(ops.batch_invert(a)) == inv


def test_legendre(ops_vals):
    ops, vals, a = ops_vals
    p = ops.spec.p
    leg = ops.to_ints(ops.legendre(a))
    for v, l in zip(vals, leg):
        assert l == pow(v, (p - 1) // 2, p)


def test_sqrt(ops_vals):
    ops, vals, _ = ops_vals
    p = ops.spec.p
    sq_vals = [v * v % p for v in vals]
    root, ok = ops.sqrt(ops.from_ints(sq_vals))
    rv = ops.to_ints(root)
    assert np.asarray(ok).all()
    for r, s in zip(rv, sq_vals):
        assert (r * r) % p == s
    nr = next(v for v in range(2, 50) if pow(v, (p - 1) // 2, p) == p - 1)
    _, ok2 = ops.sqrt(ops.from_ints([nr]))
    assert not bool(np.asarray(ok2)[0])


def test_halve_double_select(ops_vals):
    ops, vals, a = ops_vals
    p = ops.spec.p
    half = pow(2, -1, p)
    assert ops.to_ints(ops.halve(a)) == [(v * half) % p for v in vals]
    assert ops.to_ints(ops.double(a)) == [2 * v % p for v in vals]


def test_vector_serialization(ops_vals):
    ops, vals, a = ops_vals
    blob = ops.marshal_vector(a)
    assert ops.to_ints(ops.unmarshal_vector(blob)) == vals


def test_exp_matches_pow(ops_vals):
    ops, vals, a = ops_vals
    p = ops.spec.p
    e = 0xDEADBEEFCAFE
    assert ops.to_ints(ops.exp(a, e)) == [pow(v, e, p) for v in vals]


def test_cmp_and_bit_len():
    from ringo_tpu.fields import limb
    from ringo_tpu.fields.spec import REFERENCE_FIELDS

    spec = REFERENCE_FIELDS["zp255"]
    import numpy as np
    vals = [0, 1, 2, spec.p - 1, spec.p // 2, 12345678901234567890,
            1 << 200, (1 << 200) - 1]
    digits = limb.ints_to_digits(vals, spec.w)
    # bit_len against python
    bl = limb.bit_len(digits)
    assert list(bl) == [v.bit_length() for v in vals]
    # 3-way cmp of all pairs
    for i, a in enumerate(vals):
        for j, b in enumerate(vals):
            da = limb.ints_to_digits([a], spec.w)
            db = limb.ints_to_digits([b], spec.w)
            want = (a > b) - (a < b)
            assert int(limb.cmp(da, db)[0]) == want, (a, b)


def test_mul_by_consts():
    from ringo_tpu.fields.field_ops import FieldOps
    from ringo_tpu.fields.spec import REFERENCE_FIELDS

    spec = REFERENCE_FIELDS["zp110"]
    ops = FieldOps(spec)
    vals = [0, 1, spec.p - 1, 98765432123456789]
    a = ops.from_ints(vals)
    for mul_fn, k in ((ops.mul_by_3, 3), (ops.mul_by_5, 5),
                      (ops.mul_by_13, 13)):
        got = ops.to_ints(mul_fn(a))
        assert got == [v * k % spec.p for v in vals]
    assert list(ops.bit_len(a)) == [v.bit_length() for v in vals]
