"""BP gather-path vs matmul-path equivalence.

``bp_decode`` rides the MXU via one-hot routing operators when the graph
is small (``TannerGraph.edge_var_onehot``), and falls back to the
gather/segment-sum formulation for large graphs — the path a non-lifted
n ~ 10^4 code would take through ``BpDecoder``.  The fallback was never
cross-checked against the matmul path (round-4 gap): same graphs, same
syndromes, both paths, compared here under the repo's float standard
(hard/converge/iteration exact on these sizes, llr to reduction-order
tolerance).
"""

import numpy as np
import pytest

from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel


def _random_graph(seed, m=24, n=60):
    r = np.random.default_rng(seed)
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        rows = r.choice(m, size=int(r.integers(2, 5)), replace=False)
        H[rows, j] = 1
    for i in range(m):
        if H[i].sum() == 0:
            H[i, int(r.integers(n))] = 1
    return H


@pytest.mark.parametrize("seed", [11, 22])
@pytest.mark.parametrize("bp_method", ["minimum_sum", "product_sum"])
def test_gather_path_matches_matmul_path(seed, bp_method):
    H = _random_graph(seed)
    graph = TannerGraph(H)
    assert graph.edge_var_onehot is not None  # small graph: matmul path

    r = np.random.default_rng(seed + 1)
    B = 12
    errors = (r.random((B, graph.n)) < 0.06).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(graph.n, 0.06))), (B, graph.n)
    )
    kw = dict(bp_method=bp_method, max_iter=15, ms_scaling_factor=0.625)

    ref = bp_decode(graph, synd, llr0, **kw)

    graph.edge_var_onehot = None  # force the large-graph gather fallback
    out = bp_decode(graph, synd, llr0, **kw)

    assert np.array_equal(np.asarray(out.converged),
                          np.asarray(ref.converged))
    assert np.array_equal(np.asarray(out.iterations),
                          np.asarray(ref.iterations))
    assert np.array_equal(np.asarray(out.hard), np.asarray(ref.hard))
    llr, llr_ref = np.asarray(out.llr), np.asarray(ref.llr)
    confident = np.abs(llr_ref) > 1.0
    assert np.array_equal(np.sign(llr[confident]),
                          np.sign(llr_ref[confident]))
    assert np.allclose(llr, llr_ref, atol=1e-3)
