"""Micro-benchmark: per-block-iteration cost of BP kernel variants.

Times the fused BP kernel on an all-failing batch (random syndromes at high
weight rarely converge) at several max_iter values; the slope of time vs
iterations isolates the per-iteration cost from fixed dispatch/entry cost.
"""

import os
import time

import numpy as np

B = 8192
BLOCK = int(__import__("os").environ.get("BP_BLOCK", 128))


def timeit(fn, *args, steps=10):
    out = fn(*args)
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.ops.pallas_bp import bp_decode_pallas, build_bp_operators

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    bp_ops = jax.device_put(build_bp_operators(graph))
    graph_dev = jax.device_put(graph)

    r = np.random.default_rng(7)
    # weight-heavy random syndromes: essentially nothing converges
    synd = jax.device_put(r.integers(0, 2, (B, graph.m)).astype(np.uint8))
    llr0 = jax.device_put(
        np.broadcast_to(
            np.asarray(llr_from_channel(np.full(graph.n, 0.05))),
            (B, graph.n),
        ).copy()
    )

    nblocks = B // BLOCK
    for label, extra in [("f32", {}), ("bf16", {"msg_dtype": "bfloat16"})]:
        ts = {}
        for mi in (32, 64, 128):
            fn = jax.jit(
                lambda g, o, s, l, mi=mi: bp_decode_pallas(
                    g, o, s, l, max_iter=mi, bp_method="minimum_sum",
                    ms_scaling_factor=0.0, block=BLOCK, **extra
                )[2].sum()
            )
            ts[mi] = timeit(fn, graph_dev, bp_ops, synd, llr0)
        slope = (ts[128] - ts[32]) / (128 - 32) / nblocks * 1e3
        print(
            f"{label}: t32={ts[32]:.1f}ms t64={ts[64]:.1f}ms "
            f"t128={ts[128]:.1f}ms  per-block-iter={slope:.2f}us"
        )


if __name__ == "__main__":
    main()
