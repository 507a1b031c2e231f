"""End-to-end example programs: reduced size always; full reference size
(mult at rank 2^13, reference examples/mult/main.go:67-129; bfv at its
default) under RINGO_EXAMPLE_FULL=1 — slower (~30-60 s each), run in the
gated suite so the shipped programs are known-good at the sizes the
reference runs them."""

import os
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))

_FULL = bool(os.environ.get("RINGO_EXAMPLE_FULL"))


def test_mult_example():
    import mult
    mult.main(log_rank=8)


def test_bfv_example():
    import bfv
    bfv.main(log_n=8)


@pytest.mark.skipif(not _FULL, reason="set RINGO_EXAMPLE_FULL=1")
def test_mult_example_reference_size():
    import mult
    mult.main()  # defaults to the reference's rank 2^13


@pytest.mark.skipif(not _FULL, reason="set RINGO_EXAMPLE_FULL=1")
def test_bfv_example_reference_size():
    import bfv
    bfv.main()
