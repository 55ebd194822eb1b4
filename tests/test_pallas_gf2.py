"""Pallas elimination kernel vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph
from bp_osd_tpu.decoder.osd import _eliminate
from bp_osd_tpu.ops.pallas_gf2 import eliminate_pallas

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("code_fn", [
    lambda: hgp(rep_code(3), rep_code(3)).hz,
    lambda: hgp(mkmn_16_4_6()).hx,
])
def test_pallas_eliminate_matches_xla(code_fn):
    H = code_fn().toarray()
    g = TannerGraph(H)
    B = 8
    errors = (RNG.random((B, g.n)) < 0.07).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.int32)
    llr = RNG.normal(0, 1, (B, g.n)).astype(np.float32)
    perm = np.argsort(llr, axis=1, kind="stable").astype(np.int32)

    h_ref, s_ref, pid_ref, prow_ref, pmask_ref = _eliminate(
        g, jnp.asarray(perm), jnp.asarray(synd)
    )
    h_pal, s_pal, pid_pal, prow_pal, pmask_pal = eliminate_pallas(
        g, perm, synd, block=8, interpret=True
    )

    assert np.array_equal(np.asarray(pid_ref), np.asarray(pid_pal))
    assert np.array_equal(np.asarray(prow_ref), np.asarray(prow_pal))
    assert np.array_equal(np.asarray(pmask_ref), np.asarray(pmask_pal))
    assert np.array_equal(np.asarray(s_ref), np.asarray(s_pal))
    assert np.array_equal(np.asarray(h_ref), np.asarray(h_pal))


def test_pallas_eliminate_dynamic_indexing_variant():
    H = hgp(rep_code(3), rep_code(3)).hz.toarray()
    g = TannerGraph(H)
    B = 8
    errors = (RNG.random((B, g.n)) < 0.07).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.int32)
    perm = np.argsort(RNG.normal(0, 1, (B, g.n)), axis=1, kind="stable").astype(np.int32)
    a = eliminate_pallas(g, perm, synd, block=8, interpret=True, safe_indexing=True)
    b = eliminate_pallas(g, perm, synd, block=8, interpret=True, safe_indexing=False)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
