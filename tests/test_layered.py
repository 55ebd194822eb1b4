"""Layered (serial-schedule) BP: correctness + convergence advantage."""

import numpy as np
import pytest

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel
from bp_osd_tpu.decoder.layered import (
    LayeredTannerGraph,
    bp_decode_layered,
    color_checks,
)

RNG = np.random.default_rng(31)


def test_coloring_is_conflict_free_and_complete():
    H = hgp(mkmn_16_4_6()).hx.toarray()
    layers = color_checks(H)
    all_checks = np.concatenate(layers)
    assert sorted(all_checks) == list(range(H.shape[0]))
    for layer in layers:
        # no two checks in a layer touch the same variable
        cols = H[layer].sum(axis=0)
        assert cols.max() <= 1


def test_layered_graph_row_permutation():
    H = hgp(rep_code(3), rep_code(3)).hz.toarray()
    g = LayeredTannerGraph(H)
    assert np.array_equal(g.H, H[g.row_perm])
    lo_prev = 0
    for lo, hi in g.layer_bounds:
        assert lo == lo_prev and hi > lo
        lo_prev = hi
    assert lo_prev == H.shape[0]


@pytest.mark.parametrize("bp_method", ["minimum_sum", "product_sum"])
def test_layered_bp_decodes_correctly(bp_method):
    H = hgp(rep_code(3), rep_code(3)).hz.toarray()
    g = LayeredTannerGraph(H)
    B = 32
    errors = (RNG.random((B, H.shape[1])) < 0.08).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr0 = llr_from_channel(np.full(H.shape[1], 0.08))
    res = bp_decode_layered(g, synds, llr0, bp_method=bp_method, max_iter=20)
    hard = np.asarray(res.hard)
    conv = np.asarray(res.converged)
    # converged samples satisfy the (original-indexing) syndrome
    assert conv.sum() > 0
    assert np.array_equal((hard[conv] @ H.T) % 2, synds[conv])


def test_layered_converges_at_least_as_fast_as_flooding():
    """On the flagship code, layered BP needs no more iterations on average
    than the flooding schedule (the whole point of the serial schedule)."""
    qcode = hgp(mkmn_16_4_6())
    H = qcode.hx.toarray()
    gl = LayeredTannerGraph(H)
    gf = TannerGraph(H)
    B = 64
    errors = (RNG.random((B, H.shape[1])) < 0.04).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr0 = llr_from_channel(np.full(H.shape[1], 0.04))

    flood = bp_decode(gf, synds, llr0, bp_method="ms", max_iter=30,
                      ms_scaling_factor=0.625)
    layer = bp_decode_layered(gl, synds, llr0, bp_method="ms", max_iter=30,
                              ms_scaling_factor=0.625)
    conv_f = np.asarray(flood.converged)
    conv_l = np.asarray(layer.converged)
    assert conv_l.sum() >= conv_f.sum()
    both = conv_f & conv_l
    mean_f = np.asarray(flood.iterations)[both].mean()
    mean_l = np.asarray(layer.iterations)[both].mean()
    assert mean_l <= mean_f


def test_serial_schedule_through_decoder_api():
    from bp_osd_tpu import BpOsdDecoder

    H = hgp(rep_code(3), rep_code(3)).hz.toarray()
    bpd = BpOsdDecoder(H, error_rate=0.05, max_iter=13, bp_method="ms",
                       ms_scaling_factor=0.625, osd_method="osd_cs",
                       osd_order=4, schedule="serial")
    B = 16
    errors = (RNG.random((B, 13)) < 0.1).astype(np.uint8)
    synds = (errors @ H.T) % 2
    out = bpd.decode_batch(synds)
    assert np.array_equal((out @ H.T) % 2, synds)
