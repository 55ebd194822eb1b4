"""Data-parallel sharded decoding over the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from bp_osd_tpu.codes import hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel, osd_decode
from bp_osd_tpu.parallel import make_mesh, pad_batch, sharded_decode_fn

RNG = np.random.default_rng(3)


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_batch():
    arr = np.ones((13, 4))
    padded, B = pad_batch(arr, 8)
    assert padded.shape == (16, 4)
    assert B == 13
    assert not padded[13:].any()


def test_sharded_decode_matches_single_device():
    surface = hgp(rep_code(3), rep_code(3))
    H = surface.hz.toarray()
    g = TannerGraph(H)
    mesh = make_mesh(8)
    decode = sharded_decode_fn(
        g, mesh, bp_method="ms", max_iter=13, ms_scaling_factor=0.625,
        osd_method="osd_cs", osd_order=4,
    )
    B = 32
    errors = (RNG.random((B, g.n)) < 0.1).astype(np.uint8)
    synds = (errors @ H.T) % 2
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(g.n, 0.1))), (B, g.n)
    ).copy()

    osdw_sh, osd0_sh, bp_sh, conv_sh = decode(synds, llr0)

    # single-device reference path
    bp = bp_decode(g, synds, llr0, bp_method="ms", max_iter=13,
                   ms_scaling_factor=0.625)
    osd = osd_decode(g, synds, bp.llr, osd_method="osd_cs", osd_order=4)
    keep = np.asarray(bp.converged)[:, None]
    osdw_ref = np.where(keep, np.asarray(bp.hard), np.asarray(osd.osdw))

    assert np.array_equal(np.asarray(osdw_sh), osdw_ref)
    assert np.array_equal(np.asarray(conv_sh), np.asarray(bp.converged))
    # outputs really are sharded over the mesh
    assert len(osdw_sh.sharding.device_set) == 8


def test_sharded_decode_flagship_code_compiles():
    """[[400,16,6]] decode step compiles and runs across the 8-way mesh."""
    qcode = hgp(mkmn_16_4_6())
    g = TannerGraph(qcode.hx.toarray())
    mesh = make_mesh(8)
    decode = sharded_decode_fn(
        g, mesh, bp_method="ms", max_iter=8, ms_scaling_factor=0.0,
        osd_method="osd_cs", osd_order=3,
    )
    B = 16
    errors = (RNG.random((B, g.n)) < 0.05).astype(np.uint8)
    synds = (errors @ g.H.T) % 2
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(g.n, 0.05))), (B, g.n)
    ).copy()
    osdw, _, _, _ = decode(synds, llr0)
    osdw = np.asarray(osdw)
    assert np.array_equal((osdw @ g.H.T) % 2, synds)
