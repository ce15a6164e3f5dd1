"""Native C++ loader tests: parity with np.loadtxt on real data files."""

import glob

import numpy as np
import pytest

from nmma_tpu.native import native_available, parse_many, parse_table

BULLA = sorted(glob.glob("/root/reference/nmma/tests/data/bulla/*.dat"))
MACRO = sorted(glob.glob("/root/reference/nmma/tests/data/eos_macro/*.dat"))


def test_native_builds():
    assert native_available(), "libnmma_native.so did not build/load"


@pytest.mark.parametrize("path", [BULLA[0], MACRO[0],
                                  "/root/reference/example_files/eos/ALF2.dat"])
def test_parse_table_matches_loadtxt(path):
    got = parse_table(path)
    want = np.atleast_2d(np.loadtxt(path))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0, equal_nan=True)


def test_parse_many_threads():
    files = BULLA + MACRO
    got = parse_many(files, n_threads=8)
    for path, arr in zip(files, got):
        want = np.atleast_2d(np.loadtxt(path))
        assert arr.shape == want.shape
        np.testing.assert_allclose(arr, want, equal_nan=True)
