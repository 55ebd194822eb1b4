"""Throughput bench: n ~ 10^4 lifted-product code (BASELINE.md row 5).

Single-chip: dense-layout BP (XLA path; the one-hot Pallas operator would
be ~0.5 GB at this size) + batched OSD.  Multi-chip meshes edge-shard BP
via ``parallel.large_code.edge_sharded_bposd_fn``; on one real chip this
script still exercises that code path on a 1x1 mesh when ``--sharded``.

Prints one JSON line with syndromes/s (not the headline metric; recorded
in BASELINE.md row 5).
"""

import json
import os
import sys
import time

import numpy as np

# [[(na*nb + ma*mb) * L]] with 1x5 protograph: N = 26 * L
PROTO = [[(0,), (3,), (11,), (19,), (24,)]]
LIFT = 400  # N = (25 + 1) * 400 = 10400, m = 2000
P_ERR = 0.01
B = 64
STEPS = 4
MAX_ITER = 64
OSD_ORDER = 15


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    import jax.numpy as jnp

    from bp_osd_tpu.codes import lifted_hgp
    from bp_osd_tpu.decoder import TannerGraph, bp_decode, llr_from_channel, osd_decode
    from bp_osd_tpu.decoder.osd import build_osd_consts

    t0 = time.time()
    qcode = lifted_hgp(PROTO, lift=LIFT)
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    m, n = H.shape
    print(f"bench_large: [[{n},{qcode.K},?]] m={m} built in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    graph = jax.device_put(TannerGraph(H))
    consts = jax.device_put(build_osd_consts(graph, "osd_cs", OSD_ORDER))
    llr0 = jax.device_put(
        np.broadcast_to(np.asarray(llr_from_channel(np.full(n, P_ERR))),
                        (B, n)).copy()
    )

    def step(graph_arg, synd, llr0, osd_consts):
        bp = bp_decode(graph_arg, synd, llr0, bp_method="minimum_sum",
                       max_iter=MAX_ITER, ms_scaling_factor=0.625)
        osd = osd_decode(graph_arg, synd, bp.llr, osd_method="osd_cs",
                         osd_order=OSD_ORDER, consts=osd_consts)
        osdw = jnp.where(bp.converged[:, None], bp.hard, osd.osdw)
        return jnp.sum(osdw, axis=1), jnp.sum(bp.converged)

    jitted = jax.jit(step)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        errors = (r.random((B, n)) < P_ERR).astype(np.uint8)
        return (errors @ H.T % 2).astype(np.uint8)

    batches = [jax.device_put(make_batch(s)) for s in range(STEPS)]
    print("bench_large: compiling...", file=sys.stderr, flush=True)
    w, c = jitted(graph, batches[0], llr0, consts)
    w.block_until_ready()
    print("bench_large: timing...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for s in range(STEPS):
        w, c = jitted(graph, batches[s], llr0, consts)
    w.block_until_ready()
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"syndromes_per_sec_lifted_product_n{n}_p{P_ERR}_osdcs{OSD_ORDER}",
        "value": round(STEPS * B / dt, 2),
        "unit": "syndromes/s/chip",
        "n": n, "m": m, "batch": B, "bp_converged": int(c),
        "max_iter": MAX_ITER,
    }))


if __name__ == "__main__":
    main()
