"""Fused Pallas osd_cs kernel vs the XLA OSD path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel, osd_decode
from bp_osd_tpu.decoder.osd import build_osd_consts
from bp_osd_tpu.ops.pallas_osd import osd_cs_pallas


def _setup(H, B, p=0.05, seed=7, max_iter=32):
    graph = TannerGraph(H)
    n = H.shape[1]
    rng = np.random.default_rng(seed)
    errors = (rng.random((B, n)) < p).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    llr0 = np.broadcast_to(np.asarray(llr_from_channel(np.full(n, p))), (B, n))
    bp = bp_decode(graph, synd, llr0, bp_method="minimum_sum",
                   max_iter=max_iter, ms_scaling_factor=0.0)
    perm = jnp.argsort(jnp.asarray(bp.llr), axis=1, stable=True).astype(jnp.int32)
    return graph, synd, bp, perm


@pytest.mark.parametrize(
    "code,order,B",
    [("surface", 4, 64), ("flagship", 7, 32), ("flagship", 42, 32)],
)
def test_fused_osd_cs_matches_xla(code, order, B):
    if code == "surface":
        H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    else:
        H = np.asarray(hgp(mkmn_16_4_6()).hx.toarray(), np.uint8)
    graph, synd, bp, perm = _setup(H, B)
    ref = osd_decode(graph, synd, bp.llr, osd_method="osd_cs",
                     osd_order=order,
                     consts=build_osd_consts(graph, "osd_cs", order))
    e0, ew = osd_cs_pallas(graph, perm, jnp.asarray(synd, jnp.int32),
                           osd_order=order, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(e0).astype(np.uint8), np.asarray(ref.osd0))
    np.testing.assert_array_equal(
        np.asarray(ew).astype(np.uint8), np.asarray(ref.osdw))


def test_fused_osd_cs_skip_masks_only_skipped():
    H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    graph, synd, bp, perm = _setup(H, 64, p=0.08)
    order = 4
    ref = osd_decode(graph, synd, bp.llr, osd_method="osd_cs",
                     osd_order=order,
                     consts=build_osd_consts(graph, "osd_cs", order))
    skip = np.zeros(64, bool)
    skip[::3] = True  # arbitrary skips, deliberately NOT clustered
    e0, ew = osd_cs_pallas(graph, perm, jnp.asarray(synd, jnp.int32),
                           osd_order=order, skip=jnp.asarray(skip),
                           interpret=True)
    keep = ~skip
    np.testing.assert_array_equal(
        np.asarray(e0).astype(np.uint8)[keep], np.asarray(ref.osd0)[keep])
    np.testing.assert_array_equal(
        np.asarray(ew).astype(np.uint8)[keep], np.asarray(ref.osdw)[keep])


def test_osd_decode_routes_pallas_osd_cs():
    """osd_decode(backend='pallas', osd_cs) must hit the fused kernel."""
    H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    graph, synd, bp, perm = _setup(H, 64, p=0.08)
    ref = osd_decode(graph, synd, bp.llr, osd_method="osd_cs", osd_order=4,
                     consts=build_osd_consts(graph, "osd_cs", 4))
    out = osd_decode(graph, synd, bp.llr, osd_method="osd_cs", osd_order=4,
                     backend="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(out.osd0), np.asarray(ref.osd0))
    np.testing.assert_array_equal(np.asarray(out.osdw), np.asarray(ref.osdw))


def test_osd_e_pallas_matches_xla():
    """Fused osd_e (Gray-code sweep) == XLA exhaustive search, bit for
    bit, including candidate tie-break (first minimum in counting order)."""
    import jax.numpy as jnp

    from bp_osd_tpu.codes import hgp, rep_code
    from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel
    from bp_osd_tpu.decoder.osd import osd_decode

    H = hgp(rep_code(4), rep_code(4)).hx.toarray()
    g = TannerGraph(H)
    B = 24
    rng = np.random.default_rng(31)
    errors = (rng.random((B, g.n)) < 0.12).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr0 = np.asarray(llr_from_channel(np.full(g.n, 0.12)))
    bp = bp_decode(g, synds, llr0, bp_method="ms", max_iter=6,
                   ms_scaling_factor=0.625)

    # 14 exceeds the old order-12 fused cap (lifted in round 4 by the
    # adaptive tie-break key base) and stays within the shared ceiling 16
    for order in (1, 3, 7, 14):
        ref = osd_decode(g, synds, bp.llr, osd_method="osd_e",
                         osd_order=order, backend="xla")
        fused = osd_decode(g, synds, bp.llr, osd_method="osd_e",
                           osd_order=order, backend="pallas",
                           interpret=True)
        np.testing.assert_array_equal(np.asarray(fused.osd0),
                                      np.asarray(ref.osd0))
        np.testing.assert_array_equal(np.asarray(fused.osdw),
                                      np.asarray(ref.osdw))


def test_osd_e_pallas_skip_and_ml_exact():
    """Fused osd_e at full order k is maximum likelihood; skip rows are
    bypassed without corrupting live rows."""
    from bp_osd_tpu.codes import hamming_code
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.ops.pallas_osd import osd_e_pallas

    H = np.asarray(hamming_code(3).toarray(), np.uint8)
    g = TannerGraph(H)
    n = g.n
    B = 16
    rng = np.random.default_rng(5)
    errors = (rng.random((B, n)) < 0.15).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr = rng.normal(size=(B, n)).astype(np.float32)
    perm = np.argsort(llr, axis=1, kind="stable").astype(np.int32)
    skip = np.zeros(B, np.int32)
    skip[B // 2 :] = 1

    k = n - g.rank
    e0, ew = osd_e_pallas(g, perm, synds, osd_order=k, skip=skip,
                          interpret=True)
    ew = np.asarray(ew)[: B // 2]
    # every live decoding satisfies its syndrome
    assert np.array_equal((ew @ H.T) % 2, synds[: B // 2])
    # full-order osd_e is ML: no syndrome-matching vector is lighter
    for b in range(B // 2):
        w = ew[b].sum()
        for trial in range(1 << n):
            v = np.array([(trial >> i) & 1 for i in range(n)], np.uint8)
            if v.sum() < w:
                assert not np.array_equal((H @ v) % 2, synds[b])
