"""Monte-Carlo sim harness: config/output contract + statistical sanity."""

import json

import numpy as np
import pytest

from bp_osd_tpu.codes import hgp, rep_code
from bp_osd_tpu.sim import css_decode_sim


@pytest.fixture(scope="module")
def surface():
    return hgp(rep_code(3), rep_code(3), compute_distance=True)


def run_sim(surface, tmp_path=None, **overrides):
    opts = dict(
        error_rate=0.05,
        target_runs=300,
        xyz_error_bias=[1, 1, 1],
        bp_method="ms",
        ms_scaling_factor=0.625,
        osd_method="osd_cs",
        osd_order=4,
        channel_update=None,
        seed=42,
        max_iter=10,
        batch_size=100,
        tqdm_disable=1,
        run_sim=0,
    )
    opts.update(overrides)
    if tmp_path is not None:
        opts["output_file"] = str(tmp_path / "out.json")
    sim = css_decode_sim(hx=surface.hx, hz=surface.hz, **opts)
    return sim


def test_sim_runs_and_reports(surface, tmp_path):
    sim = run_sim(surface, tmp_path)
    out = json.loads(sim.run_decode_sim())
    assert sim.run_count == 300
    assert out["run_count"] == 300
    # output dict carries the reference's key set
    for key in [
        "osdw_logical_error_rate",
        "osdw_logical_error_rate_eb",
        "osd0_logical_error_rate",
        "osdw_word_error_rate",
        "bp_logical_error_rate",
        "min_logical_weight",
        "bp_converge_count_x",
        "bp_converge_count_z",
        "runtime",
        "runtime_readable",
        "start_date",
        "seed",
        "K",
        "N",
    ]:
        assert key in out, key
    assert out["N"] == 13 and out["K"] == 1
    # checkpoint file holds the same JSON
    with open(sim.output_file) as f:
        saved = json.load(f)
    assert saved["run_count"] == 300
    # counters are consistent
    assert 0 <= out["osdw_success_count"] <= 300
    assert out["osdw_logical_error_rate"] == 1 - out["osdw_success_count"] / 300
    # osdw must do at least as well as plain BP
    assert out["osdw_success_count"] >= out["bp_success_count"]


def test_sim_low_error_rate_mostly_succeeds(surface):
    sim = run_sim(surface, error_rate=0.01, target_runs=200, batch_size=200)
    out = json.loads(sim.run_decode_sim())
    # d=3 code at p=0.01: failure rate must be well under 10%
    assert out["osdw_logical_error_rate"] < 0.1


@pytest.mark.parametrize("direction", ["x->z", "z->x"])
def test_sim_channel_update_paths(surface, direction):
    sim = run_sim(
        surface,
        channel_update=direction,
        xyz_error_bias=[1, 1, 0.5],
        target_runs=100,
        batch_size=50,
    )
    out = json.loads(sim.run_decode_sim())
    assert out["run_count"] == 100


def test_sim_biased_channel_pure_z(surface):
    """xyz_error_bias=[0,0,1]: only Z errors, X decoder sees nothing."""
    sim = run_sim(
        surface,
        xyz_error_bias=[0, 0, 1],
        target_runs=100,
        batch_size=100,
    )
    out = json.loads(sim.run_decode_sim())
    # X component never errs -> convergence on the X side is trivial
    assert out["bp_converge_count_x"] == 100


def test_sim_hadamard_rotate(surface):
    sim = run_sim(
        surface,
        hadamard_rotate=1,
        hadamard_rotate_sector1_length=9,
        target_runs=50,
        batch_size=50,
    )
    assert np.allclose(sim.channel_probs_x[:9], sim.px)
    assert np.allclose(sim.channel_probs_x[9:], sim.pz)
    out = json.loads(sim.run_decode_sim())
    assert out["run_count"] == 50


def test_sim_resume_from_output_dict(surface):
    sim = run_sim(surface, target_runs=100, batch_size=50)
    sim.run_decode_sim()
    saved = json.loads(sim.output_dict())
    saved["target_runs"] = 150
    saved["run_sim"] = 0
    resumed = css_decode_sim(hx=surface.hx, hz=surface.hz, **saved)
    assert resumed.run_count == 100
    assert resumed.osdw_success_count == saved["osdw_success_count"]
    resumed.run_decode_sim()
    assert resumed.run_count == 150


def test_sim_invalid_code_raises():
    h = rep_code(7)
    with pytest.raises(Exception, match="invalid CSS code"):
        css_decode_sim(hx=h, hz=h, error_rate=0.05, run_sim=0)


def test_sim_sharded_over_mesh(surface):
    """use_mesh=1: batch shards across the 8 virtual devices."""
    import jax

    sim = run_sim(surface, use_mesh=1, batch_size=64, target_runs=128)
    assert sim.batch_size % len(jax.devices()) == 0
    out = json.loads(sim.run_decode_sim())
    assert out["run_count"] == 128


def test_sim_single_device_mode(surface):
    sim = run_sim(surface, use_mesh=0, batch_size=50, target_runs=100)
    out = json.loads(sim.run_decode_sim())
    assert out["run_count"] == 100
