"""GF(2) linear algebra: validate against brute-force / algebraic invariants."""

import numpy as np
import pytest
import scipy.sparse as sp

from bp_osd_tpu import gf2

RNG = np.random.default_rng(7)


def random_matrix(m, n, density=0.3):
    return (RNG.random((m, n)) < density).astype(np.uint8)


def naive_rank(A):
    """Reference rank via fraction-free elimination over GF(2)."""
    A = A.copy().astype(np.uint8) % 2
    m, n = A.shape
    r = 0
    for c in range(n):
        rows = np.nonzero(A[r:, c])[0]
        if rows.size == 0:
            continue
        p = r + rows[0]
        A[[r, p]] = A[[p, r]]
        for i in range(m):
            if i != r and A[i, c]:
                A[i] ^= A[r]
        r += 1
        if r == m:
            break
    return r


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (10, 10), (17, 33), (40, 65), (64, 64), (65, 129)])
def test_rank_matches_naive(shape):
    for _ in range(5):
        A = random_matrix(*shape)
        assert gf2.rank(A) == naive_rank(A)


def test_pack_unpack_roundtrip():
    for shape in [(1, 1), (5, 63), (5, 64), (5, 65), (3, 200)]:
        A = random_matrix(*shape)
        P, n = gf2.pack_rows(A)
        assert np.array_equal(gf2.unpack_rows(P, n), A)


def test_row_echelon_transform_invariant():
    for shape in [(6, 9), (12, 8), (20, 20)]:
        A = random_matrix(*shape)
        re, r, T, pivots = gf2.row_echelon(A)
        assert np.array_equal((T @ A) % 2, re)
        assert r == naive_rank(A)
        assert len(pivots) == r
        # echelon structure: pivot of row i at pivots[i], zeros below
        for i, c in enumerate(pivots):
            assert re[i, c] == 1
            assert not re[i + 1 :, c].any() or True  # below eliminated
            assert not re[i + 1 :, : c + 1].any()


def test_reduced_row_echelon_pivot_columns_are_unit():
    A = random_matrix(15, 25)
    re, r, T, pivots = gf2.reduced_row_echelon(A)
    assert np.array_equal((T @ A) % 2, re)
    for i, c in enumerate(pivots):
        col = re[:, c]
        expected = np.zeros(15, np.uint8)
        expected[i] = 1
        assert np.array_equal(col, expected)


def test_nullspace_annihilates():
    for shape in [(4, 8), (10, 16), (30, 50)]:
        A = random_matrix(*shape)
        N = gf2.nullspace(A).toarray()
        assert N.shape[0] == shape[1] - gf2.rank(A)
        assert not np.any((A @ N.T) % 2)
        # basis rows independent
        assert gf2.rank(N) == N.shape[0]


def test_kernel_alias():
    A = random_matrix(5, 9)
    assert np.array_equal(gf2.kernel(A).toarray(), gf2.nullspace(A).toarray())


def test_pivot_rows_selects_leading_independent_set():
    A = np.array(
        [
            [1, 0, 1],
            [1, 0, 1],  # duplicate of row 0
            [0, 1, 0],
            [1, 1, 1],  # = row0 + row2
        ],
        dtype=np.uint8,
    )
    assert list(gf2.pivot_rows(A)) == [0, 2]
    B = random_matrix(12, 20)
    piv = gf2.pivot_rows(B)
    assert gf2.rank(B[piv]) == len(piv) == gf2.rank(B)


def test_row_span_contains_all_combinations():
    A = random_matrix(4, 10)
    span = gf2.row_span(A).toarray()
    r = gf2.rank(A)
    assert span.shape == (2**r, 10)
    assert not span[0].any()  # zero row first (reference stab.py:72 skips it)
    seen = {row.tobytes() for row in span}
    assert len(seen) == 2**r
    # every original row is in the span
    for row in A:
        assert row.tobytes() in seen


def test_inverse():
    while True:
        A = random_matrix(12, 12, 0.5)
        if gf2.rank(A) == 12:
            break
    inv = gf2.inverse(A)
    assert np.array_equal((inv @ A) % 2, np.eye(12, dtype=np.uint8))


def test_sparse_input_accepted():
    A = random_matrix(8, 13)
    assert gf2.rank(sp.csr_matrix(A)) == gf2.rank(A)
    assert np.array_equal(
        gf2.nullspace(sp.csr_matrix(A)).toarray(), gf2.nullspace(A).toarray()
    )
