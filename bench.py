"""Headline benchmark: flagship [[400,16,6]] BP+OSD decode throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.

Workload = the reference's headline example at its EXACT semantics
(reference ``examples/qldpc_decode_example.py:8-23``): the [[400,16,6]]
MKMN hypergraph-product code at p = 0.05, min-sum BP with the variable
scaling factor (``ms_scaling_factor=0``) run to ``max_iter = 0 -> N = 400``
(reference ``README.md:183``), osd_cs post-processing at order 42.  The
reference decodes one syndrome at a time in Cython; here a large syndrome
batch is decoded per dispatch on one chip via the staged Pallas pipeline
(``decoder/pipeline.py``).

The baseline is MEASURED in this environment: ``measure_baseline.py`` builds
``bp_osd_tpu/native/cpu_baseline.cpp`` (serial C++ BP+OSD with the reference
decode semantics — the stand-in for the un-installable ``ldpc`` Cython
engine) and times it on this workload, recording the result in
``BASELINE_MEASURED.json``.  ``vs_baseline`` divides by that figure; if the
file is missing it falls back to the round-1 documented estimate (1e3/s,
which the measurement confirmed to within 8%: 920.8 synd/s).

Roofline fields (north-star "speed-of-light" accounting, BASELINE.json):
``pct_mxu_peak`` uses the analytic per-iteration BP matmul flops actually
executed (per-sample iteration counts) against the v5e f32-via-MXU peak;
``pct_hbm_peak`` uses the analytic HBM bytes each kernel moves per dispatch
against the v5e HBM bandwidth.  Both are intentionally conservative: the
pipeline was DESIGNED to be VMEM-resident, so low HBM pressure is the
success condition, and the OSD stage is integer VPU work that shows up in
neither number — ``bottleneck`` names the binding resource.
"""

import json
import os
import time

import numpy as np

_FALLBACK_BASELINE = 1000.0  # round-1 estimate; see docstring

# v5e single-chip peaks (public spec: 197 bf16 TFLOPS, 819 GB/s HBM);
# f32 matmuls ride the MXU at ~1/4 the bf16 rate
_V5E_F32_MATMUL_FLOPS = 197e12 / 4
_V5E_HBM_BYTES_PER_S = 819e9


def _baseline_synd_per_sec() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["syndromes_per_sec"])
    except (OSError, ValueError, KeyError):
        return _FALLBACK_BASELINE


REFERENCE_CPU_SYNDROMES_PER_SEC = _baseline_synd_per_sec()

P = 0.05
MAX_ITER = 400  # reference max_iter=0 -> N
STAGE1 = 32
OSD_ORDER = 42
B = 8192  # syndromes per dispatch
STEPS = 8  # timed dispatches, distinct batches


def main():
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

    import jax.numpy as jnp

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.decoder.osd import build_osd_consts
    from bp_osd_tpu.decoder.pipeline import decode_pipeline

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    print("bench: connecting to device...", file=sys.stderr, flush=True)
    on_tpu = jax.devices()[0].platform != "cpu"
    print("bench: device ready", file=sys.stderr, flush=True)
    backend = "pallas" if on_tpu else "xla"

    # ALL decode-time constants live on device ONCE — shipping numpy
    # operators through the dispatch re-uploads megabytes per call (this
    # alone was a 7x throughput loss through the remote-TPU tunnel)
    consts = jax.device_put(build_osd_consts(graph, "osd_cs", OSD_ORDER))
    H = graph.H
    graph_dev = jax.device_put(graph)
    if backend == "pallas":
        from bp_osd_tpu.ops.pallas_bp import build_bp_operators

        bp_ops = jax.device_put(build_bp_operators(graph))
    else:
        bp_ops = None

    def decode_step(graph_arg, syndromes, llr0, osd_consts, ops):
        out = decode_pipeline(
            graph_arg, syndromes, llr0,
            bp_method="minimum_sum", max_iter=MAX_ITER,
            ms_scaling_factor=0.0, osd_method="osd_cs", osd_order=OSD_ORDER,
            consts=osd_consts, backend=backend, bp_operators=ops,
            stage1_iters=STAGE1,
        )
        # reduce on-device so the host transfer is O(B), not O(B*n)
        return (jnp.sum(out.osdw, axis=1), jnp.sum(out.converged),
                jnp.sum(out.iterations))

    jitted = jax.jit(decode_step)

    llr0 = jax.device_put(
        np.broadcast_to(
            np.asarray(llr_from_channel(np.full(graph.n, P))), (B, graph.n)
        ).copy()
    )

    def make_batch(seed):
        r = np.random.default_rng(seed)
        errors = (r.random((B, graph.n)) < P).astype(np.uint8)
        return (errors @ H.T % 2).astype(np.uint8)

    batches = [jax.device_put(make_batch(s)) for s in range(STEPS)]

    print("bench: compiling...", file=sys.stderr, flush=True)
    w, conv, iters = jitted(graph_dev, batches[0], llr0, consts, bp_ops)
    w.block_until_ready()
    print("bench: compiled, timing...", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for s in range(STEPS):
        w, conv, iters = jitted(graph_dev, batches[s], llr0, consts, bp_ops)
    w.block_until_ready()
    elapsed = time.perf_counter() - t0

    syndromes_per_sec = STEPS * B / elapsed
    conv_frac = float(conv) / B
    mean_iters = float(iters) / B

    # ---- roofline accounting (per timed dispatch, analytic) -------------
    m_pad = -(-graph.m // 128) * 128
    n_pad = -(-graph.n // 128) * 128
    E = graph.wr * m_pad
    # BP matmul flops per sample-iteration: var->edge + edge->var
    # [1, n_pad] x [n_pad, E] twice, syndrome check + lane-replication
    # matmuls [1, n_pad] x [n_pad, m_pad] and [1, m_pad] x [m_pad, n_pad]
    flops_per_sample_iter = 2 * (2 * n_pad * E) + 2 * (2 * n_pad * m_pad)
    bp_flops = float(iters) * flops_per_sample_iter  # last dispatch
    pct_mxu = (
        (bp_flops / (elapsed / STEPS)) / _V5E_F32_MATMUL_FLOPS
        if on_tpu else 0.0
    )

    W32 = graph.num_words
    bytes_bp_io = B * 4 * (m_pad + 2 * n_pad) + B * 4 * 4 * n_pad  # in+out
    bytes_osd_io = B * 4 * (
        graph.n + 32 * W32 + 2 * m_pad + 8          # perm/ppos/synd/skip in
        + W32 * m_pad                               # broadcast H operand
        + 2 * m_pad + 2 * graph.rank + 8            # sout/sbest/pid/prow/tbest
    )
    # stage-2 BP re-reads its io for the failure fraction; count it fully
    bytes_total = 2 * bytes_bp_io + bytes_osd_io
    pct_hbm = (bytes_total / (elapsed / STEPS)) / _V5E_HBM_BYTES_PER_S

    print(
        json.dumps(
            {
                "metric": "syndromes_per_sec_[[400,16,6]]_p0.05_ms0_maxit400_osdcs42",
                "value": round(syndromes_per_sec, 1),
                "unit": "syndromes/s/chip",
                "vs_baseline": round(
                    syndromes_per_sec / REFERENCE_CPU_SYNDROMES_PER_SEC, 2
                ),
                "baseline_synd_per_sec": REFERENCE_CPU_SYNDROMES_PER_SEC,
                "baseline_source": "BASELINE_MEASURED.json (serial C++ BP+OSD, same semantics)",
                "bp_converged_frac": round(conv_frac, 4),
                "bp_mean_iterations": round(mean_iters, 2),
                "pct_mxu_peak": round(100 * pct_mxu, 2),
                "pct_hbm_peak": round(100 * pct_hbm, 2),
                "bottleneck": "vpu_int_gf2_elimination+search (VMEM-resident by design)",
                "batch": B,
                "steps": STEPS,
            }
        )
    )


if __name__ == "__main__":
    main()
