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


def test_pallas_eliminate_skip_masks_samples():
    """Skipped samples leave non-skipped outputs bit-identical, and the
    skip flag composes with batch padding."""
    H = hgp(mkmn_16_4_6()).hx.toarray()
    g = TannerGraph(H)
    B = 12  # not a multiple of the block: exercises pad-as-skip too
    errors = (RNG.random((B, g.n)) < 0.07).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.int32)
    perm = np.argsort(
        RNG.normal(0, 1, (B, g.n)), axis=1, kind="stable"
    ).astype(np.int32)
    skip = (RNG.random(B) < 0.5).astype(np.int32)

    ref = eliminate_pallas(g, perm, synd, block=16, interpret=True)
    out = eliminate_pallas(g, perm, synd, skip=skip, block=16, interpret=True)
    live = skip == 0
    for x, y in zip(ref, out):
        assert np.array_equal(np.asarray(x)[live], np.asarray(y)[live])


def test_osd_decode_skip_parity():
    """osd_decode(skip=conv) equals the unskipped decode on live samples,
    for both backends."""
    import jax.numpy as jnp

    from bp_osd_tpu.decoder.osd import build_osd_consts, osd_decode

    H = hgp(rep_code(4), rep_code(4)).hz.toarray()
    g = TannerGraph(H)
    consts = build_osd_consts(g, "osd_cs", 4)
    B = 16
    errors = (RNG.random((B, g.n)) < 0.08).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.int32)
    llr = RNG.normal(0, 1, (B, g.n)).astype(np.float32)
    skip = (RNG.random(B) < 0.4)
    live = ~skip
    for backend in ("xla", "pallas"):
        kw = dict(osd_method="osd_cs", osd_order=4, consts=consts,
                  backend=backend)
        if backend == "pallas":
            import contextlib

            from jax.experimental.pallas import tpu as pltpu

            ctx = pltpu.force_tpu_interpret_mode()
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            ref = osd_decode(g, synd, llr, **kw)
            out = osd_decode(g, synd, llr, skip=jnp.asarray(skip), **kw)
        assert np.array_equal(np.asarray(ref.osd0)[live], np.asarray(out.osd0)[live])
        assert np.array_equal(np.asarray(ref.osdw)[live], np.asarray(out.osdw)[live])


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
