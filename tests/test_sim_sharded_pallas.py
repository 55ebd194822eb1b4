"""Sim harness end-to-end on the sharded-pallas backend (8-dev CPU mesh)."""

import numpy as np

from bp_osd_tpu.codes import hgp, rep_code
from bp_osd_tpu.sim import css_decode_sim


def test_sim_runs_sharded_pallas_backend():
    qcode = hgp(rep_code(3), rep_code(3), compute_distance=True)
    out = css_decode_sim(
        hx=qcode.hx, hz=qcode.hz, error_rate=0.05, target_runs=64,
        batch_size=32, seed=9, backend="pallas", use_mesh=1,
        osd_method="osd_cs", osd_order=2, max_iter=6, tqdm_disable=1,
        save_interval=1000, channel_update="x->z",
    )
    assert out.run_count == 64
    assert out.backend == "pallas" and out.use_mesh == 1
    assert 0.0 <= out.osdw_logical_error_rate <= 1.0
    # OSDW must be at least as good as plain BP
    assert out.osdw_success_count >= out.bp_success_count
