"""Scatter-free edge-sharded lifted BP vs the single-device shift-routed
path (round-3 VERDICT weak item 5), on the virtual (data x model) mesh.

Equality standard matches tests/test_edge_shard.py: hard decisions,
convergence, and iteration counts exact; posterior LLRs to float-
reduction-order tolerance (psum tree vs serial block-row accumulation).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from bp_osd_tpu.codes import lifted_hgp
from bp_osd_tpu.decoder import llr_from_channel
from bp_osd_tpu.decoder.lifted_bp import LiftedGraph, bp_decode_lifted
from bp_osd_tpu.parallel.lifted_shard import (ShardedLiftedGraph,
                                              lifted_sharded_bp_fn)

RNG = np.random.default_rng(23)

PROTO = [
    [(0,), (0,), (0,)],
    [(0,), (1,), (2,)],
]
LIFT = 16


def make_2d_mesh(data=4, model=2):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("bp_method", ["minimum_sum", "product_sum"])
def test_lifted_sharded_matches_unsharded(bp_method):
    qcode = lifted_hgp(PROTO, lift=LIFT)
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    m, n = H.shape
    lg = LiftedGraph(qcode.hx_proto, LIFT)
    assert (lg.m, lg.n) == (m, n)

    mesh = make_2d_mesh()
    sg = ShardedLiftedGraph(lg, n_shards=2)
    decode = lifted_sharded_bp_fn(
        sg, mesh, bp_method=bp_method, max_iter=12, ms_scaling_factor=0.0
    )

    B = 16
    errors = (RNG.random((B, n)) < 0.04).astype(np.uint8)
    synds = ((errors @ H.T) % 2).astype(np.uint8)
    pad = sg.n_shards * sg.mp_chunk * LIFT - m
    synds_pad = np.pad(synds, ((0, 0), (0, pad)))
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, 0.04))), (B, n)
    ).copy()

    hard, llr, conv, iters = decode(synds_pad, llr0)
    ref = bp_decode_lifted(lg, synds, llr0, bp_method=bp_method,
                           max_iter=12, ms_scaling_factor=0.0)

    assert np.array_equal(np.asarray(conv), np.asarray(ref.converged))
    assert np.array_equal(np.asarray(iters), np.asarray(ref.iterations))
    assert np.array_equal(np.asarray(hard), np.asarray(ref.hard))
    llr, llr_ref = np.asarray(llr), np.asarray(ref.llr)
    confident = np.abs(llr_ref) > 1.0
    assert np.array_equal(np.sign(llr[confident]),
                          np.sign(llr_ref[confident]))
    if bp_method == "minimum_sum":
        assert np.allclose(llr, llr_ref, atol=1e-3)


def test_lifted_sharded_bposd_end_to_end():
    """Scatter-free sharded BP + gather-to-DP OSD (with conv skip) must
    reproduce the single-device BP+OSD decode."""
    from bp_osd_tpu.decoder import TannerGraph
    from bp_osd_tpu.decoder.osd import build_osd_consts, osd_decode
    from bp_osd_tpu.parallel.large_code import lifted_sharded_bposd_fn

    qcode = lifted_hgp(PROTO, lift=LIFT)
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    m, n = H.shape
    lg = LiftedGraph(qcode.hx_proto, LIFT)
    mesh = make_2d_mesh()
    decode = lifted_sharded_bposd_fn(
        lg, H, mesh, n_shards=2, max_iter=12, ms_scaling_factor=0.0,
        osd_method="osd_cs", osd_order=4,
    )

    B = 16
    errors = (RNG.random((B, n)) < 0.06).astype(np.uint8)
    synds = ((errors @ H.T) % 2).astype(np.uint8)
    mpc = -(-lg.mp // 2)
    pad = 2 * mpc * LIFT - m
    synds_pad = np.pad(synds, ((0, 0), (0, pad)))
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, 0.06))), (B, n)
    ).copy()

    osdw, conv = decode(synds_pad, llr0)
    osdw, conv = np.asarray(osdw), np.asarray(conv)

    ref_bp = bp_decode_lifted(lg, synds, llr0, max_iter=12,
                              ms_scaling_factor=0.0)
    graph = TannerGraph(H)
    consts = build_osd_consts(graph, "osd_cs", 4)
    ref_osd = osd_decode(graph, synds, np.asarray(ref_bp.llr),
                         osd_method="osd_cs", osd_order=4, consts=consts)
    ref = np.where(np.asarray(ref_bp.converged)[:, None],
                   np.asarray(ref_bp.hard), np.asarray(ref_osd.osdw))

    assert np.array_equal(conv, np.asarray(ref_bp.converged))
    # converged rows carry the bit-identical BP decoding; OSD rows can
    # legitimately differ where psum-order llr deltas flip a reliability
    # near-tie (PARITY.md float caveat) — demand validity + overwhelming
    # agreement
    assert np.array_equal(osdw[conv], ref[conv])
    assert np.array_equal((osdw @ H.T) % 2, synds)
    # OSD rows: a psum-order llr delta may flip a reliability near-tie
    # (PARITY.md float caveat; incidence varies with XLA cache/thread
    # state, so a fixed agreement fraction is flaky) — but every flip
    # must be an EQUALLY GOOD decoding: non-converged, syndrome-valid
    # (asserted above), same weight
    disagree = ~(osdw == ref).all(axis=1)
    assert not (disagree & conv).any()
    np.testing.assert_array_equal(osdw[disagree].sum(axis=1),
                                  ref[disagree].sum(axis=1))


def test_lifted_sharded_uneven_blockrows():
    """mp not divisible by the shard count: pad block-rows must be inert."""
    proto = [
        [(0,), (1,)],
        [(2,), (0,)],
        [(0,), (3,)],
    ]
    qcode = lifted_hgp(proto, lift=8)
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    m, n = H.shape
    lg = LiftedGraph(qcode.hx_proto, 8)
    # 4 shards over mp=6 block-rows: mpc=2, two inert pad block-rows
    mesh = make_2d_mesh(data=2, model=4)
    sg = ShardedLiftedGraph(lg, n_shards=4)
    decode = lifted_sharded_bp_fn(sg, mesh, max_iter=10,
                                  ms_scaling_factor=0.625)

    B = 8
    errors = (RNG.random((B, n)) < 0.05).astype(np.uint8)
    synds = ((errors @ H.T) % 2).astype(np.uint8)
    pad = sg.n_shards * sg.mp_chunk * 8 - m
    synds_pad = np.pad(synds, ((0, 0), (0, pad)))
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, 0.05))), (B, n)
    ).copy()

    hard, llr, conv, iters = decode(synds_pad, llr0)
    ref = bp_decode_lifted(lg, synds, llr0, max_iter=10,
                           ms_scaling_factor=0.625)
    assert np.array_equal(np.asarray(conv), np.asarray(ref.converged))
    assert np.array_equal(np.asarray(hard), np.asarray(ref.hard))


def test_lifted_sharded_nshards1_is_unsharded_kernel():
    """TP=1 specialization: n_shards=1 must route through the unsharded
    shift-routed kernel — the routing-einsum formulation costs ~3.7x per
    iteration for nothing at one shard (r5 measurement,
    bench_lifted_shard.py).  Hard/conv/iters exact; llr to ULP tolerance
    (the same jaxpr compiles with different fusion inside shard_map)."""
    qcode = lifted_hgp(PROTO, lift=LIFT)
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    m, n = H.shape
    lg = LiftedGraph(qcode.hx_proto, LIFT)
    mesh = make_2d_mesh(data=8, model=1)
    sg = ShardedLiftedGraph(lg, n_shards=1)
    decode = lifted_sharded_bp_fn(sg, mesh, bp_method="minimum_sum",
                                  max_iter=15, ms_scaling_factor=0.0)
    B = 16
    errors = (RNG.random((B, n)) < 0.05).astype(np.uint8)
    synds = ((errors @ H.T) % 2).astype(np.uint8)
    pad = sg.n_shards * sg.mp_chunk * LIFT - m
    synds_pad = np.pad(synds, ((0, 0), (0, pad)))
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, 0.05))), (B, n)
    ).copy()
    hard, llr, conv, iters = decode(synds_pad, llr0)
    ref = bp_decode_lifted(lg, synds, llr0, bp_method="minimum_sum",
                           max_iter=15, ms_scaling_factor=0.0)
    np.testing.assert_array_equal(np.asarray(hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(ref.converged))
    np.testing.assert_array_equal(np.asarray(iters),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(llr), np.asarray(ref.llr),
                               rtol=1e-4, atol=1e-5)
