"""End-to-end example programs at reduced size (the examples themselves
default to the reference's sizes)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))


def test_mult_example():
    import mult
    mult.main(log_rank=8)


def test_bfv_example():
    import bfv
    bfv.main(log_n=8)
