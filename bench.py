"""Headline benchmark: flagship [[400,16,6]] BP+OSD decode throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload = BASELINE.md row 3: the [[400,16,6]] MKMN hypergraph-product code
at p = 0.05, min-sum with the variable scaling factor (ms_scaling_factor=0),
osd_cs order 7, decoding a large syndrome batch on one chip (the reference's
headline example, reference ``examples/qldpc_decode_example.py:5-23``,
decodes the same code one syndrome at a time in Cython).

The baseline is MEASURED in this environment: ``measure_baseline.py`` builds
``bp_osd_tpu/native/cpu_baseline.cpp`` (serial C++ BP+OSD with the reference
decode semantics — the stand-in for the un-installable ``ldpc`` Cython
engine) and times it on this workload, recording the result in
``BASELINE_MEASURED.json``.  ``vs_baseline`` divides by that figure; if the
file is missing it falls back to the round-1 documented estimate (1e3/s,
which the measurement confirmed to within 8%: 920.8 synd/s).
"""

import json
import os
import time

import numpy as np

_FALLBACK_BASELINE = 1000.0  # round-1 estimate; see docstring


def _baseline_synd_per_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["syndromes_per_sec"])
    except (OSError, ValueError, KeyError):
        return _FALLBACK_BASELINE


REFERENCE_CPU_SYNDROMES_PER_SEC = _baseline_synd_per_sec()


def main():
    import os
    import sys

    import jax

    # persistent compile cache: repeated bench runs skip the slow remote
    # AOT compile of the full decode program
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import (
        TannerGraph,
        bp_decode,
        llr_from_channel,
        osd_decode,
    )
    from bp_osd_tpu.decoder.osd import build_osd_consts
    from bp_osd_tpu.ops.pallas_bp import bp_decode_pallas, build_bp_operators

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    consts = build_osd_consts(graph, "osd_cs", 7)
    p = 0.05
    B = 4096  # syndromes per dispatch
    steps = 6  # timed dispatches

    import jax.numpy as jnp

    bp_ops = build_bp_operators(graph)

    def decode_step_pallas(graph_arg, syndromes, llr0, osd_consts, ops):
        hard, llr, conv, _ = bp_decode_pallas(
            graph_arg, ops, syndromes, llr0,
            bp_method="minimum_sum", max_iter=32,
            ms_scaling_factor=0.0, block=128,
        )
        # sort failures to the front so converged samples cluster into
        # whole elimination blocks, which skip + exit immediately
        order = jnp.argsort(conv.astype(jnp.int32), stable=True)
        osd = osd_decode(
            graph_arg, syndromes[order], llr[order],
            osd_method="osd_cs", osd_order=7, consts=osd_consts,
            backend="pallas", skip=conv[order],
        )
        inv = jnp.argsort(order)
        osdw = jnp.where(conv[:, None], hard, osd.osdw[inv])
        # reduce on-device so the host transfer is O(B), not O(B*n)
        return jnp.sum(osdw, axis=1), jnp.sum(conv)

    def decode_step_xla(graph_arg, syndromes, llr0, osd_consts, ops):
        bp = bp_decode(
            graph_arg,
            syndromes,
            llr0,
            bp_method="minimum_sum",
            max_iter=32,
            ms_scaling_factor=0.0,
        )
        osd = osd_decode(
            graph_arg, syndromes, bp.llr,
            osd_method="osd_cs", osd_order=7, consts=osd_consts,
        )
        keep = bp.converged[:, None]
        osdw = jnp.where(keep, bp.hard, osd.osdw)
        return jnp.sum(osdw, axis=1), jnp.sum(bp.converged)

    # the Pallas kernels need real TPU Mosaic (or interpret mode); fall
    # back to the pure-XLA formulation anywhere they cannot compile
    if jax.devices()[0].platform == "cpu":
        jitted = jax.jit(decode_step_xla)
    else:
        jitted = jax.jit(decode_step_pallas)

    rng = np.random.default_rng(0)
    # stage inputs on device once: the metric is decode throughput, and a
    # production pipeline keeps channel priors resident and double-buffers
    # syndrome uploads behind compute
    llr0 = jax.device_put(
        np.broadcast_to(
            np.asarray(llr_from_channel(np.full(graph.n, p))), (B, graph.n)
        ).copy()
    )

    def make_batch(seed):
        r = np.random.default_rng(seed)
        errors = (r.random((B, graph.n)) < p).astype(np.uint8)
        return (errors @ graph.H.T % 2).astype(np.uint8)

    batches = [jax.device_put(make_batch(s)) for s in range(steps)]

    # warmup / compile
    print("bench: compiling...", file=sys.stderr, flush=True)
    w, conv = jitted(graph, batches[0], llr0, consts, bp_ops)
    w.block_until_ready()
    print("bench: compiled, timing...", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for s in range(steps):
        w, conv = jitted(graph, batches[s], llr0, consts, bp_ops)
    w.block_until_ready()
    elapsed = time.perf_counter() - t0

    syndromes_per_sec = steps * B / elapsed
    print(
        json.dumps(
            {
                "metric": "syndromes_per_sec_[[400,16,6]]_p0.05_ms0_osdcs7",
                "value": round(syndromes_per_sec, 1),
                "unit": "syndromes/s/chip",
                "vs_baseline": round(
                    syndromes_per_sec / REFERENCE_CPU_SYNDROMES_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
