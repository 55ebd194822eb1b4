"""Edge-sharded BP over a 2D (data x model) virtual mesh vs single-device."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel
from bp_osd_tpu.parallel.edge_shard import ShardedTannerGraph, edge_sharded_bp_fn

RNG = np.random.default_rng(17)


def make_2d_mesh(data=4, model=2):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("bp_method", ["minimum_sum", "product_sum"])
def test_edge_sharded_bp_matches_dense(bp_method):
    H = hgp(mkmn_16_4_6()).hx.toarray()
    m, n = H.shape
    mesh = make_2d_mesh()
    sg = ShardedTannerGraph(H, n_shards=2)
    decode = edge_sharded_bp_fn(
        sg, mesh, bp_method=bp_method, max_iter=12, ms_scaling_factor=0.625
    )

    B = 16
    errors = (RNG.random((B, n)) < 0.03).astype(np.uint8)
    synds = ((errors @ H.T) % 2).astype(np.uint8)
    # pad syndromes out to the sharded check layout
    pad = sg.n_shards * sg.m_chunk - m
    synds_pad = np.pad(synds, ((0, 0), (0, pad)))
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, 0.03))), (B, n)
    ).copy()

    hard, llr, conv = decode(synds_pad, llr0)

    g = TannerGraph(H)
    ref = bp_decode(g, synds, llr0, bp_method=bp_method, max_iter=12,
                    ms_scaling_factor=0.625)

    assert np.array_equal(np.asarray(conv), np.asarray(ref.converged))
    assert np.array_equal(np.asarray(hard), np.asarray(ref.hard))
    # soft outputs: product-sum's atanh near saturation amplifies
    # reduction-order float noise — require sign agreement on confident
    # values and loose closeness for min-sum
    llr, llr_ref = np.asarray(llr), np.asarray(ref.llr)
    confident = np.abs(llr_ref) > 1.0
    assert np.array_equal(np.sign(llr[confident]), np.sign(llr_ref[confident]))
    if bp_method == "minimum_sum":
        assert np.allclose(llr, llr_ref, atol=1e-3)


def test_sharded_graph_partition_covers_matrix():
    H = hgp(rep_code(5), rep_code(4)).hz.toarray()
    sg = ShardedTannerGraph(H, n_shards=4)
    # reassemble H from the shard layouts
    m, n = H.shape
    rebuilt = np.zeros((sg.n_shards * sg.m_chunk, n), np.uint8)
    for d in range(sg.n_shards):
        for i in range(sg.m_chunk):
            for j in range(sg.wr):
                v = sg.chk_var[d, i, j]
                if v < n:
                    rebuilt[d * sg.m_chunk + i, v] = 1
    assert np.array_equal(rebuilt[:m], H)
    assert not rebuilt[m:].any()
