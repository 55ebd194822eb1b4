"""Code-construction layer: mirrors the reference test-suite plus golden
matrix parity against the reference's shipped HGP code data (reference
``tests/test_css.py``, ``tests/test_hgp.py``, ``tests/test_stab.py``,
``examples/codes/hgp_codes/*.txt``)."""

import os

import numpy as np
import pytest

from bp_osd_tpu import gf2
from bp_osd_tpu.codes import (
    css_code,
    hamming_code,
    hgp,
    hgp_single,
    mkmn_16_4_6,
    rep_code,
    ring_code,
    stab_code,
    compute_exact_code_distance,
)

REF = "/root/reference"


def test_rep_code():
    h = rep_code(5).toarray()
    assert h.shape == (4, 5)
    assert np.array_equal(h[0], [1, 1, 0, 0, 0])
    assert np.array_equal(h[3], [0, 0, 0, 1, 1])
    assert compute_exact_code_distance(h) == 5


def test_ring_code():
    h = ring_code(4).toarray()
    assert h.shape == (4, 4)
    assert (h.sum(axis=0) == 2).all() and (h.sum(axis=1) == 2).all()
    assert gf2.rank(h) == 3


def test_hamming_code_matches_readme():
    # exact matrix from reference README.md:65-74
    h = hamming_code(3).toarray()
    expected = np.array(
        [[0, 0, 0, 1, 1, 1, 1], [0, 1, 1, 0, 0, 1, 1], [1, 0, 1, 0, 1, 0, 1]],
        dtype=np.uint8,
    )
    assert np.array_equal(h, expected)
    assert compute_exact_code_distance(h) == 3


def test_css_code_steane():
    # reference tests/test_css.py:8-27 (sparse and dense input paths)
    h = hamming_code(3)
    for hx in (h, h.toarray()):
        qcode = css_code(hx=hx, hz=hx, code_distance=3, name="Steane code")
        assert qcode.N == 7
        assert qcode.K == 1
        assert qcode.D == 3
        assert qcode.test(show_tests=False)


def test_css_steane_logicals_match_readme():
    # reference README.md:84-88: lx = lz = [1 1 1 0 0 0 0]
    h = hamming_code(3)
    qcode = css_code(hx=h, hz=h)
    assert np.array_equal(qcode.lx.toarray(), [[1, 1, 1, 0, 0, 0, 0]])
    assert np.array_equal(qcode.lz.toarray(), [[1, 1, 1, 0, 0, 0, 0]])


def test_css_code_invalid_rep_code():
    # reference README.md:125-131: rep-code CSS is invalid
    h = rep_code(7)
    qcode = css_code(h, h)
    assert qcode.K == -5
    assert not qcode.test(show_tests=False)


def test_css_logical_commutation_invariants():
    h = hamming_code(3)
    qcode = css_code(h, h)
    lx, lz = qcode.lx.toarray(), qcode.lz.toarray()
    assert not np.any((qcode.hz.toarray() @ lx.T) % 2)
    assert not np.any((qcode.hx.toarray() @ lz.T) % 2)
    assert gf2.rank((lx @ lz.T) % 2) == qcode.K


def test_hgp_surface_code():
    # reference tests/test_hgp.py:9-19
    h = rep_code(3)
    qcode = hgp(h1=h, h2=h, compute_distance=True)
    assert qcode.test(show_tests=False)
    assert qcode.N == 13
    assert qcode.K == 1
    assert qcode.D == 3


def test_hgp_mkmn_seed():
    # reference tests/test_hgp.py:21-39 uses the same 12x16 MKMN-style seed
    HL = mkmn_16_4_6().toarray()
    qcode = hgp(HL, HL, compute_distance=True)
    assert qcode.test(show_tests=False)
    assert qcode.N == 400
    assert qcode.K == 16
    assert qcode.D == 6


def test_hgp_single_is_symmetric_product():
    h = rep_code(4)
    a = hgp(h)
    b = hgp_single(h)
    assert np.array_equal(a.hx.toarray(), b.hx.toarray())
    assert np.array_equal(a.hz.toarray(), b.hz.toarray())


def test_hgp_kron_structure():
    """hx = [h1 (x) I | I (x) h2^T], hz = [I (x) h2 | h1^T (x) I]."""
    h1 = rep_code(3).toarray()
    h2 = rep_code(4).toarray()
    q = hgp(h1, h2)
    m1, n1 = h1.shape
    m2, n2 = h2.shape
    hx_expected = np.hstack(
        [np.kron(h1, np.eye(n2, dtype=np.uint8)), np.kron(np.eye(m1, dtype=np.uint8), h2.T)]
    )
    hz_expected = np.hstack(
        [np.kron(np.eye(n1, dtype=np.uint8), h2), np.kron(h1.T, np.eye(m2, dtype=np.uint8))]
    )
    assert np.array_equal(q.hx.toarray(), hx_expected % 2)
    assert np.array_equal(q.hz.toarray(), hz_expected % 2)


def test_stab_five_qubit_code():
    # reference tests/test_stab.py:6-22
    h = np.array(
        [
            [1, 0, 1, 0, 1, 0, 0, 1, 1, 0],
            [0, 0, 1, 1, 0, 1, 0, 0, 1, 1],
            [0, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 1, 1, 1, 1],
        ]
    )
    qcode = stab_code(h[:, :5], h[:, 5:])
    assert qcode.test(show_tests=False)
    assert qcode.N == 5
    assert qcode.K == 1
    assert qcode.compute_code_distance() == 3


def test_css_to_stab_roundtrip():
    h = hamming_code(3)
    qcode = css_code(h, h)
    scode = qcode.to_stab_code()
    assert scode.N == 7
    assert scode.K == 1


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_mkmn_seed_matches_reference_file():
    ref = np.loadtxt(
        f"{REF}/examples/codes/classical_seed_codes/mkmn_16_4_6.txt"
    ).astype(np.uint8)
    assert np.array_equal(mkmn_16_4_6().toarray(), ref)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_hgp_400_matches_reference_golden_matrices():
    """Bit-for-bit parity with the [[400,16,6]] golden matrices shipped by
    the reference (examples/codes/hgp_codes/hgp_(4,7)-[[400,16,6]]_*.txt)."""
    qcode = hgp(mkmn_16_4_6(), compute_distance=True)
    base = f"{REF}/examples/codes/hgp_codes/hgp_(4,7)-[[400,16,6]]"
    hx = np.loadtxt(f"{base}_hx.txt").astype(np.uint8)
    hz = np.loadtxt(f"{base}_hz.txt").astype(np.uint8)
    assert np.array_equal(qcode.hx.toarray(), hx)
    assert np.array_equal(qcode.hz.toarray(), hz)
    # logicals need not be identical representatives, but must span the same
    # logical classes: same count, commutation, and mutual span modulo the
    # stabilizer image.
    lx_ref = np.loadtxt(f"{base}_lx.txt").astype(np.uint8)
    lz_ref = np.loadtxt(f"{base}_lz.txt").astype(np.uint8)
    lx = qcode.lx.toarray()
    lz = qcode.lz.toarray()
    assert lx.shape == lx_ref.shape and lz.shape == lz_ref.shape
    # lx is defined modulo the X-stabilizer image (rowspace of hx); lz modulo hz
    for ours, ref, h_stab in ((lx, lx_ref, hx), (lz, lz_ref, hz)):
        stack_ref = np.vstack([h_stab, ref])
        stack_both = np.vstack([h_stab, ref, ours])
        assert gf2.rank(stack_ref) == gf2.rank(stack_both)


def test_lifted_product_l1_equals_hgp():
    from bp_osd_tpu.codes import lifted_hgp

    h = rep_code(3).toarray()
    proto = [
        [(0,) if h[i, j] else () for j in range(h.shape[1])]
        for i in range(h.shape[0])
    ]
    lp = lifted_hgp(proto, lift=1)
    ref = hgp(h, h)
    assert np.array_equal(lp.hx.toarray(), ref.hx.toarray())
    assert np.array_equal(lp.hz.toarray(), ref.hz.toarray())


def test_lifted_product_toric_from_single_entry():
    from bp_osd_tpu.codes import lifted_hgp

    lp = lifted_hgp([[(0, 1)]], lift=6)
    assert lp.N == 12
    assert lp.K == 2  # toric code
    assert lp.test(show_tests=False)


def test_lifted_product_nontrivial_lift_is_valid():
    from bp_osd_tpu.codes import lifted_hgp

    proto = [
        [(0,), (11,), (7,), (12,)],
        [(1,), (8,), (1,), (8,)],
        [(11,), (0,), (4,), (8,)],
    ]
    lp = lifted_hgp(proto, lift=13)
    assert lp.N == 325
    assert lp.K == 25
    assert lp.test(show_tests=False)


def test_surface_and_toric_families():
    from bp_osd_tpu.codes import surface_code, toric_code

    for d in (3, 5):
        sc = surface_code(d, compute_distance=True)
        assert (sc.N, sc.K, sc.D) == (d * d + (d - 1) * (d - 1), 1, d)
        assert sc.test(show_tests=False)
    tc = toric_code(4, compute_distance=True)
    assert (tc.N, tc.K, tc.D) == (32, 2, 4)
    assert tc.test(show_tests=False)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_larger_mkmn_seeds_match_reference_files():
    from bp_osd_tpu.codes import mkmn_20_5_8, mkmn_24_6_10

    for fn, name in [(mkmn_20_5_8, "mkmn_20_5_8"), (mkmn_24_6_10, "mkmn_24_6_10")]:
        ref = np.loadtxt(
            f"{REF}/examples/codes/classical_seed_codes/{name}.txt"
        ).astype(np.uint8)
        assert np.array_equal(fn().toarray(), ref)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_hgp_625_and_900_logical_classes_match_reference():
    """The reference ships lx/lz for [[625,25,8]] and [[900,36,10]] (hx/hz
    stripped — regenerate via the hgp construction, then check logical-class
    equivalence)."""
    from bp_osd_tpu.codes import mkmn_20_5_8, mkmn_24_6_10

    for seed_fn, params in [
        (mkmn_20_5_8, "(4,7)-[[625,25,8]]"),
        (mkmn_24_6_10, "(4,7)-[[900,36,10]]"),
    ]:
        qcode = hgp(seed_fn())
        base = f"{REF}/examples/codes/hgp_codes/hgp_{params}"
        lx_ref = np.loadtxt(f"{base}_lx.txt").astype(np.uint8)
        lz_ref = np.loadtxt(f"{base}_lz.txt").astype(np.uint8)
        assert qcode.lx.shape == lx_ref.shape
        assert qcode.lz.shape == lz_ref.shape
        hx = qcode.hx.toarray()
        hz = qcode.hz.toarray()
        for ours, ref, h_stab in ((qcode.lx.toarray(), lx_ref, hx),
                                  (qcode.lz.toarray(), lz_ref, hz)):
            stack_ref = np.vstack([h_stab, ref])
            stack_both = np.vstack([h_stab, ref, ours])
            assert gf2.rank(stack_ref) == gf2.rank(stack_both)
