"""The full constraint suite again, on the jax backend (plain-representation
device ring path): sumcheck + squared two-norm + automorphism, and the
approximate inf-norm (modular J-L with second-round witnesses)."""

import pytest

from ringo_tpu import backend

import test_constraints as tc


@pytest.fixture(scope="module", autouse=True)
def jax_backend():
    backend.use("jax")
    yield
    backend.use("numpy")


def test_sumcheck_twonorm_aut_device():
    tc.test_sumcheck_twonorm_aut()


def test_approx_inf_norm_device():
    tc.test_approx_inf_norm()
