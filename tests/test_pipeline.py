"""Staged decode pipeline vs straight XLA decode (semantic equality)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bp_osd_tpu.codes import hgp, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel, osd_decode
from bp_osd_tpu.decoder.osd import build_osd_consts
from bp_osd_tpu.decoder.pipeline import decode_pipeline
from bp_osd_tpu.ops.pallas_bp import build_bp_operators


def _workload(B=64, p=0.08, seed=3):
    H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    graph = TannerGraph(H)
    n = H.shape[1]
    rng = np.random.default_rng(seed)
    errors = (rng.random((B, n)) < p).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    llr0 = np.broadcast_to(np.asarray(llr_from_channel(np.full(n, p))), (B, n))
    return graph, synd, llr0


def test_pipeline_xla_matches_components():
    graph, synd, llr0 = _workload()
    out = decode_pipeline(
        graph, synd, llr0, bp_method="minimum_sum", max_iter=13,
        ms_scaling_factor=0.0, osd_method="osd_cs", osd_order=4,
        backend="xla",
    )
    bp = bp_decode(graph, synd, llr0, bp_method="minimum_sum", max_iter=13,
                   ms_scaling_factor=0.0)
    osd = osd_decode(graph, synd, bp.llr, osd_method="osd_cs", osd_order=4)
    expect = np.where(np.asarray(bp.converged)[:, None], np.asarray(bp.hard),
                      np.asarray(osd.osdw))
    np.testing.assert_array_equal(np.asarray(out.osdw), expect)
    np.testing.assert_array_equal(np.asarray(out.converged),
                                  np.asarray(bp.converged))
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(bp.iterations))


def test_pipeline_staged_pallas_matches_straight_run():
    """Stage-1 cap + failure re-decode must equal a straight long run.

    Uses the pallas backend in interpret mode on the d=3 surface code with
    a deliberately tiny stage-1 budget so stage 2 genuinely re-decodes.
    """
    graph, synd, llr0 = _workload(B=64, p=0.10)
    consts = build_osd_consts(graph, "osd_cs", 4)
    ops = build_bp_operators(graph)
    staged = decode_pipeline(
        graph, synd, llr0, bp_method="minimum_sum", max_iter=13,
        ms_scaling_factor=0.0, osd_method="osd_cs", osd_order=4,
        consts=consts, backend="pallas", bp_operators=ops,
        stage1_iters=2, interpret=True,
    )
    straight = decode_pipeline(
        graph, synd, llr0, bp_method="minimum_sum", max_iter=13,
        ms_scaling_factor=0.0, osd_method="osd_cs", osd_order=4,
        consts=consts, backend="pallas", bp_operators=ops,
        stage1_iters=13, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(staged.converged),
                                  np.asarray(straight.converged))
    np.testing.assert_array_equal(np.asarray(staged.iterations),
                                  np.asarray(straight.iterations))
    np.testing.assert_array_equal(np.asarray(staged.osdw),
                                  np.asarray(straight.osdw))
    np.testing.assert_array_equal(np.asarray(staged.osd0),
                                  np.asarray(straight.osd0))
    np.testing.assert_array_equal(np.asarray(staged.bp_hard),
                                  np.asarray(straight.bp_hard))


def test_multi_stage_schedule_matches_single_stage():
    """A (4, 8) stage schedule must produce bit-identical results to the
    plain two-stage pipeline (resume exactness across re-clusterings)."""
    import numpy as np

    from bp_osd_tpu.codes import hgp, rep_code
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.decoder.osd import build_osd_consts
    from bp_osd_tpu.decoder.pipeline import decode_pipeline
    from bp_osd_tpu.ops.pallas_bp import build_bp_operators

    H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    graph = TannerGraph(H)
    ops = build_bp_operators(graph)
    consts = build_osd_consts(graph, "osd_cs", 4)
    B = 32
    rng = np.random.default_rng(19)
    errors = (rng.random((B, graph.n)) < 0.08).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    llr0 = np.asarray(llr_from_channel(np.full(graph.n, 0.08)))

    kw = dict(bp_method="ms", max_iter=16, ms_scaling_factor=0.0,
              osd_method="osd_cs", osd_order=4, consts=consts,
              backend="pallas", bp_operators=ops, interpret=True)
    multi = decode_pipeline(graph, synd, llr0, stage1_iters=(4, 8), **kw)
    single = decode_pipeline(graph, synd, llr0, stage1_iters=4, **kw)
    np.testing.assert_array_equal(np.asarray(multi.converged),
                                  np.asarray(single.converged))
    np.testing.assert_array_equal(np.asarray(multi.iterations),
                                  np.asarray(single.iterations))
    np.testing.assert_array_equal(np.asarray(multi.osdw),
                                  np.asarray(single.osdw))
    np.testing.assert_array_equal(np.asarray(multi.bp_hard),
                                  np.asarray(single.bp_hard))


def test_prefix_cond_picks_smallest_covering_prefix():
    """_prefix_cond must dispatch the B/4 / B/2 / B branch by failure
    count, and small batches bypass the cascade entirely."""
    import jax.numpy as jnp

    from bp_osd_tpu.decoder.pipeline import _prefix_cond

    B = 2048
    fn = lambda prefix: jnp.full((B,), prefix, jnp.int32)  # noqa: E731
    assert int(_prefix_cond(B, jnp.int32(100), fn)[0]) == 512
    assert int(_prefix_cond(B, jnp.int32(512), fn)[0]) == 512
    assert int(_prefix_cond(B, jnp.int32(513), fn)[0]) == 768
    assert int(_prefix_cond(B, jnp.int32(769), fn)[0]) == 1024
    assert int(_prefix_cond(B, jnp.int32(1025), fn)[0]) == 1280
    assert int(_prefix_cond(B, jnp.int32(1281), fn)[0]) == 2048
    assert int(_prefix_cond(512, jnp.int32(1), fn)[0]) == 512  # no cascade


def test_pipeline_prefix_dispatch_large_batch():
    """B >= 1024 takes the prefix-cond OSD/stage-2 branches; outputs must
    still match the straight XLA reference exactly."""
    from jax.experimental.pallas import tpu as pltpu

    graph, synd, llr0 = _workload(B=1024, p=0.09, seed=9)
    ops = build_bp_operators(graph)
    consts = build_osd_consts(graph, "osd_cs", 3)
    with pltpu.force_tpu_interpret_mode():
        out = decode_pipeline(
            graph, synd, llr0, bp_method="minimum_sum", max_iter=12,
            ms_scaling_factor=0.625, osd_method="osd_cs", osd_order=3,
            consts=consts, backend="pallas", bp_operators=ops,
            stage1_iters=4,
        )
    bp = bp_decode(graph, synd, llr0, bp_method="minimum_sum", max_iter=12,
                   ms_scaling_factor=0.625)
    osd = osd_decode(graph, synd, bp.llr, osd_method="osd_cs", osd_order=3)
    expect = np.where(np.asarray(bp.converged)[:, None], np.asarray(bp.hard),
                      np.asarray(osd.osdw))
    # the failure fraction at this operating point sits well under B/4,
    # so the smallest branch runs; equality pins the pad/merge logic
    assert (~np.asarray(bp.converged)).sum() < 256
    np.testing.assert_array_equal(np.asarray(out.osdw), expect)
    np.testing.assert_array_equal(np.asarray(out.converged),
                                  np.asarray(bp.converged))
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(bp.iterations))
