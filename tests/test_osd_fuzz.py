"""Cross-implementation OSD fuzz: XLA vs fused batch-on-lanes vs
per-sample streamed kernels must agree bit-for-bit on random codes.

Three independent implementations of the same contract (reference
``README.md:185-187``) triple-check each other across random graph
shapes, ranks, and tie patterns — the class of divergence this targets
(pivot selection, candidate order, tie-breaks) is exactly what single
golden-vector tests can miss.  Interpret mode; sizes kept CPU-small.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bp_osd_tpu.decoder import TannerGraph
from bp_osd_tpu.decoder.osd import osd_decode
from bp_osd_tpu.ops.pallas_osd import osd_cs_pallas
from bp_osd_tpu.ops.pallas_osd_large import osd_cs_large_pallas


def _random_case(seed):
    r = np.random.default_rng(seed)
    m = int(r.integers(16, 40))
    n = int(r.integers(m + 10, m + 60))
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        rows = r.choice(m, size=int(r.integers(2, 5)), replace=False)
        H[rows, j] = 1
    for i in range(m):
        if H[i].sum() == 0:
            H[i, int(r.integers(n))] = 1
    B = 5
    errors = (r.random((B, n)) < 0.08).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    # quantized llr values force plenty of exact reliability ties,
    # exercising the stable-sort + first-minimum tie-break rules
    llr = np.round(r.normal(1.5, 1.0, size=(B, n)) * 4) / 4
    return TannerGraph(H), synd, llr.astype(np.float32)


@pytest.mark.parametrize("seed", [101, 202, 303])
@pytest.mark.parametrize("order", [0, 4])
def test_three_osd_implementations_agree(seed, order):
    graph, synd, llr = _random_case(seed)
    ref = osd_decode(graph, synd, llr, osd_method="osd_cs",
                     osd_order=order)

    perm = jnp.argsort(jnp.asarray(llr), axis=1, stable=True).astype(
        jnp.int32
    )
    if order > 0 and graph.n > graph.rank:
        f0, fw = osd_cs_pallas(graph, perm, synd, osd_order=order,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(ref.osd0))
        np.testing.assert_array_equal(np.asarray(fw), np.asarray(ref.osdw))

    l0, lw = osd_cs_large_pallas(graph, perm, synd, osd_order=order,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(ref.osd0))
    np.testing.assert_array_equal(np.asarray(lw), np.asarray(ref.osdw))
