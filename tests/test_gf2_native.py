"""Native C++ GF(2) kernel: bit-identical to the NumPy fallback."""

import os
import subprocess

import numpy as np
import pytest

from bp_osd_tpu import gf2
from bp_osd_tpu.native import load

RNG = np.random.default_rng(23)

pytestmark = pytest.mark.skipif(
    load() is None, reason="no C++ toolchain available"
)


def _numpy_reference(fn, *args, **kwargs):
    """Run a gf2 function with the native path disabled."""
    os.environ["BP_OSD_TPU_NO_NATIVE"] = "1"
    try:
        return fn(*args, **kwargs)
    finally:
        del os.environ["BP_OSD_TPU_NO_NATIVE"]


@pytest.mark.parametrize("shape", [(5, 9), (33, 70), (128, 200), (100, 64)])
@pytest.mark.parametrize("full", [False, True])
def test_native_row_echelon_matches_numpy(shape, full):
    A = (RNG.random(shape) < 0.3).astype(np.uint8)
    re_n, r_n, t_n, p_n = gf2.row_echelon(A, full=full)
    re_p, r_p, t_p, p_p = _numpy_reference(gf2.row_echelon, A, full=full)
    assert r_n == r_p
    assert np.array_equal(re_n, re_p)
    assert np.array_equal(t_n, t_p)
    assert np.array_equal(p_n, p_p)


def test_native_rank_matches_numpy():
    for shape in [(10, 10), (64, 64), (65, 130), (200, 150)]:
        A = (RNG.random(shape) < 0.4).astype(np.uint8)
        assert gf2.rank(A) == _numpy_reference(gf2.rank, A)


def test_native_nullspace_and_pivot_rows():
    A = (RNG.random((40, 90)) < 0.25).astype(np.uint8)
    assert np.array_equal(
        gf2.nullspace(A).toarray(),
        _numpy_reference(gf2.nullspace, A).toarray(),
    )
    assert np.array_equal(
        gf2.pivot_rows(A), _numpy_reference(gf2.pivot_rows, A)
    )


def test_native_speedup_on_large_matrix():
    """The native path must handle a lifted-product-scale matrix quickly."""
    import time

    A = (RNG.random((2000, 4000)) < 0.002).astype(np.uint8)
    t0 = time.perf_counter()
    r = gf2.rank(A)
    elapsed = time.perf_counter() - t0
    assert 0 < r <= 2000
    assert elapsed < 10.0
