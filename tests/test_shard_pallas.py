"""Sharded-pallas == unsharded-pallas == XLA decode (VERDICT r1 item 2).

The fused Pallas pipeline must produce identical decodings whether it
runs on one device or shard_mapped over the 8-device mesh, and both must
match the XLA path.  Runs in interpret mode on the virtual CPU mesh; on
real hardware the same composition compiles to Mosaic per shard.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bp_osd_tpu.codes import hgp, rep_code
from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
from bp_osd_tpu.decoder.osd import build_osd_consts
from bp_osd_tpu.decoder.pipeline import decode_pipeline
from bp_osd_tpu.ops.pallas_bp import build_bp_operators
from bp_osd_tpu.parallel.shard_pallas import shard_decode_fn


def test_sharded_pallas_matches_unsharded_and_xla():
    H = np.asarray(hgp(rep_code(3), rep_code(3)).hx.toarray(), np.uint8)
    graph = TannerGraph(H)
    n = graph.n
    B = 64
    p = 0.08
    rng = np.random.default_rng(11)
    errors = (rng.random((B, n)) < p).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, p))), (B, n)
    ).copy()
    consts = build_osd_consts(graph, "osd_cs", 4)
    ops = build_bp_operators(graph)

    kw = dict(bp_method="minimum_sum", max_iter=13, ms_scaling_factor=0.0,
              osd_method="osd_cs", osd_order=4)

    def pallas_step(synd, llr0):
        out = decode_pipeline(
            graph, synd, llr0, consts=consts, backend="pallas",
            bp_operators=ops, stage1_iters=4, interpret=True, **kw,
        )
        return out.osdw, out.converged

    unsharded = pallas_step(synd, llr0)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sharded_fn = shard_decode_fn(pallas_step, mesh)
    sharded = sharded_fn(jnp.asarray(synd), jnp.asarray(llr0))

    xla = decode_pipeline(graph, synd, llr0, consts=None, backend="xla", **kw)

    np.testing.assert_array_equal(np.asarray(sharded[0]),
                                  np.asarray(unsharded[0]))
    np.testing.assert_array_equal(np.asarray(sharded[1]),
                                  np.asarray(unsharded[1]))
    np.testing.assert_array_equal(np.asarray(unsharded[1]),
                                  np.asarray(xla.converged))
    np.testing.assert_array_equal(np.asarray(unsharded[0]),
                                  np.asarray(xla.osdw))
