"""Fused Pallas BP kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import pytest

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel
from bp_osd_tpu.ops.pallas_bp import bp_decode_pallas, build_bp_operators

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("bp_method,msf", [
    ("minimum_sum", 0.625),
    ("minimum_sum", 0.0),
    ("product_sum", 1.0),
])
def test_pallas_bp_matches_xla(bp_method, msf):
    H = hgp(rep_code(3), rep_code(3)).hz.toarray()
    g = TannerGraph(H)
    ops = build_bp_operators(g)
    B = 16
    errors = (RNG.random((B, g.n)) < 0.08).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr0 = np.asarray(llr_from_channel(np.full(g.n, 0.08)))

    ref = bp_decode(g, synds, llr0, bp_method=bp_method, max_iter=20,
                    ms_scaling_factor=msf)
    hard, llr, conv, iters = bp_decode_pallas(
        g, ops, synds, llr0, bp_method=bp_method, max_iter=20,
        ms_scaling_factor=msf, block=16, interpret=True,
    )
    assert np.array_equal(np.asarray(conv), np.asarray(ref.converged))
    assert np.array_equal(np.asarray(hard), np.asarray(ref.hard))
    assert np.array_equal(np.asarray(iters), np.asarray(ref.iterations))
    assert np.allclose(np.asarray(llr), np.asarray(ref.llr), atol=1e-4)


def test_pallas_bp_flagship_interpret():
    """[[400,16,6]]: fused kernel decodes correctly (syndrome match on
    converged samples)."""
    qcode = hgp(mkmn_16_4_6())
    H = qcode.hx.toarray()
    g = TannerGraph(H)
    ops = build_bp_operators(g)
    B = 8
    errors = (RNG.random((B, g.n)) < 0.02).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr0 = np.asarray(llr_from_channel(np.full(g.n, 0.02)))
    hard, llr, conv, iters = bp_decode_pallas(
        g, ops, synds, llr0, bp_method="ms", max_iter=30,
        ms_scaling_factor=0.625, block=8, interpret=True,
    )
    hard = np.asarray(hard)
    conv = np.asarray(conv)
    assert conv.sum() >= B // 2  # low p: most converge
    assert np.array_equal((hard[conv] @ H.T) % 2, synds[conv])
