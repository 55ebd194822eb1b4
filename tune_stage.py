"""Tune stage-1 iteration cap and BP block size for the flagship bench.

Times the FULL decode dispatch (pipelined, distinct batches) at several
(stage1_iters, bp_block) configs on the real chip; the winner goes into
bench.py.
"""

import os
import time

import numpy as np

P = 0.05
MAX_ITER = 400
OSD_ORDER = 42
B = 16384
STEPS = 12
DISTINCT = 6


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.decoder.osd import build_osd_consts
    from bp_osd_tpu.decoder.pipeline import decode_pipeline
    from bp_osd_tpu.ops.pallas_bp import build_bp_operators

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    H = graph.H
    consts = jax.device_put(build_osd_consts(graph, "osd_cs", OSD_ORDER))
    bp_ops = jax.device_put(build_bp_operators(graph))
    graph_dev = jax.device_put(graph)
    llr0 = jax.device_put(np.broadcast_to(
        np.asarray(llr_from_channel(np.full(graph.n, P))),
        (B, graph.n)).copy())

    def make_batch(seed):
        r = np.random.default_rng(seed)
        errors = (r.random((B, graph.n)) < P).astype(np.uint8)
        return (errors @ H.T % 2).astype(np.uint8)

    batches = [jax.device_put(make_batch(s)) for s in range(DISTINCT)]

    for s1 in ((32, 96), (32, 128), (24, 96), (32, 64), 48, (32, 96, 256)):
        for blk in (128,):
            fn = jax.jit(lambda g, s, l, c, o, s1=s1, blk=blk: jnp.sum(
                decode_pipeline(
                    g, s, l, bp_method="minimum_sum", max_iter=MAX_ITER,
                    ms_scaling_factor=0.0, osd_method="osd_cs",
                    osd_order=OSD_ORDER, consts=c, backend="pallas",
                    bp_operators=o, stage1_iters=s1, bp_block=blk,
                ).osdw, axis=1))
            try:
                w = fn(graph_dev, batches[0], llr0, consts, bp_ops)
                np.asarray(w[:1])  # host fetch: block_until_ready can
                # return early through the remote tunnel
            except Exception as e:
                print(f"s1={s1} blk={blk}: FAILED ({type(e).__name__})",
                      flush=True)
                continue
            t0 = time.perf_counter()
            for i in range(STEPS):
                w = fn(graph_dev, batches[i % DISTINCT], llr0, consts, bp_ops)
            np.asarray(w[:1])
            dt = (time.perf_counter() - t0) / STEPS
            print(f"s1={s1} blk={blk}: {dt*1e3:.1f} ms/dispatch "
                  f"= {B/dt:,.0f} synd/s", flush=True)


if __name__ == "__main__":
    main()
