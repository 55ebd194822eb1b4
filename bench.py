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
# f32 matmuls ride the MXU at ~1/2 the bf16 rate (the round-2 assumption
# of 1/4 put measured BP flops above "peak", which is impossible)
_V5E_F32_MATMUL_FLOPS = 197e12 / 2
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
STAGE1 = tuple(
    int(s) for s in os.environ.get("BENCH_STAGE1", "24,96").split(",")
)  # multi-stage resume schedule (on-chip tuned; r5 sweep: (24,96) edges
# out (32,96) by ~1% with the prefix-cond dispatch in place)
OSD_ORDER = 42
B = int(os.environ.get("BENCH_B", 16384))  # syndromes per dispatch
STEPS = 24  # timed dispatches, distinct batches (cycled)
DISTINCT = 8  # distinct random batches


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
    osdw_row_agreement = None  # set by the on-chip gate below
    conv_agreement = None

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

    batches = [jax.device_put(make_batch(s)) for s in range(DISTINCT)]

    # ---- on-hardware Pallas == XLA assertion (every session) ------------
    # The exact failure class of the r2 bf16 T-column bug was an
    # interpret-vs-hardware divergence the CPU test suite cannot see; this
    # re-proves the compiled kernels against the XLA path on the real chip
    # before any number is reported.  Skip with BENCH_SKIP_CHECK=1.
    if on_tpu and not os.environ.get("BENCH_SKIP_CHECK"):
        print("bench: pallas==xla on-chip check...", file=sys.stderr,
              flush=True)
        Bc = 256
        synd_c = jax.device_put(np.asarray(make_batch(977))[:Bc])
        llr_c = llr0[:Bc]
        pl_fn = jax.jit(lambda g, s, l, c, o: decode_pipeline(
            g, s, l, bp_method="minimum_sum", max_iter=MAX_ITER,
            ms_scaling_factor=0.0, osd_method="osd_cs",
            osd_order=OSD_ORDER, consts=c, backend="pallas",
            bp_operators=o, stage1_iters=STAGE1))
        xla_fn = jax.jit(lambda g, s, l: decode_pipeline(
            g, s, l, bp_method="minimum_sum", max_iter=MAX_ITER,
            ms_scaling_factor=0.0, osd_method="osd_cs",
            osd_order=OSD_ORDER, consts=None, backend="xla"))
        pres = pl_fn(graph_dev, synd_c, llr_c, consts, bp_ops)
        xres = xla_fn(graph_dev, synd_c, llr_c)
        po, xo = np.asarray(pres.osdw), np.asarray(xres.osdw)
        sh = np.asarray(synd_c)
        pc, xc = np.asarray(pres.converged), np.asarray(xres.converged)
        pi, xi = np.asarray(pres.iterations), np.asarray(xres.iterations)
        # BP is a chaotic map: the pallas and XLA paths accumulate matmul
        # partial sums in different orders, and a 1-ULP llr delta at
        # iteration ~16 amplifies exponentially (PARITY.md "Float
        # caveat").  Bit-equal convergence across all 400 iterations
        # therefore depends on compiler scheduling — it held for rounds
        # 2-4 and then flipped on 2026-08-21 for the UNCHANGED r4 code
        # when the remote compiler re-generated one of the paths (18/256
        # late-converging rows).  The gate now pins what is structurally
        # guaranteed instead: the EARLY trajectory (<= 64 iterations,
        # before float chaos can amplify) must match bit-for-bit, every
        # disagreement must be a deep-trajectory row, overall agreement
        # must stay high, and every decoding must satisfy its syndrome.
        early = (xi <= 64) | (pi <= 64)
        assert np.array_equal(pc[early], xc[early]) and \
            np.array_equal(pi[early], xi[early]), \
            "pallas/xla early-trajectory (<=64 it) mismatch: kernel bug"
        agree = (pc == xc) & (pi == xi)
        assert agree.mean() >= 0.9, \
            f"pallas/xla convergence agreement {agree.mean():.3f} < 0.9"
        deep = np.minimum(np.where(pc, pi, MAX_ITER),
                          np.where(xc, xi, MAX_ITER))
        assert (deep[~agree] > 64).all(), \
            "pallas/xla disagreement on a shallow-trajectory row"
        conv_agreement = float(agree.mean())
        assert ((po @ H.T % 2) == sh).all(), \
            "pallas osdw violates syndromes on hardware"
        assert ((xo @ H.T % 2) == sh).all(), \
            "xla osdw violates syndromes on hardware"

        # --- OSD kernel gate: IDENTICAL soft inputs -> identical bits ---
        # Feeding both OSD backends the same LLRs isolates the kernels
        # from BP float-accumulation noise; here the match must be EXACT
        # on hardware (round-3 VERDICT weak item 3 — the r2 bf16 T-column
        # bug class would fail precisely this).
        from bp_osd_tpu.decoder.osd import osd_decode

        o_args = dict(osd_method="osd_cs", osd_order=OSD_ORDER)
        op = jax.jit(lambda g, s, l, c: osd_decode(
            g, s, l, consts=c, backend="pallas", **o_args))(
                graph_dev, synd_c, xres.llr, consts)
        ox = jax.jit(lambda g, s, l, c: osd_decode(
            g, s, l, consts=c, **o_args))(graph_dev, synd_c, xres.llr,
                                          consts)
        assert np.array_equal(np.asarray(op.osdw), np.asarray(ox.osdw)), \
            "OSD kernels diverge on IDENTICAL llr inputs: kernel bug"
        assert np.array_equal(np.asarray(op.osd0), np.asarray(ox.osd0)), \
            "osd0 diverges on identical llr inputs: kernel bug"

        # --- whole-pipeline agreement (reported, not asserted to 1.0) ---
        # Remaining divergence is BP float accumulation order perturbing
        # near-tie LLRs -> a different reliability permutation -> a
        # different (equally valid) OSD search space; weights may differ
        # by a few units in either direction.  Both sides are proven
        # syndrome-satisfying above; the committed corpus
        # (tests/test_corpus.py) pins the XLA side across rounds.
        eq_rows = (po == xo).all(axis=1)
        div = np.flatnonzero(~eq_rows)
        wdelta = po[div].sum(axis=1).astype(int) - xo[div].sum(axis=1).astype(int)
        osdw_row_agreement = float(eq_rows.mean())
        print(f"bench: on-chip check OK (OSD kernels exact on identical "
              f"llr; pipeline row agreement {osdw_row_agreement:.4f}, "
              f"{div.size} BP-float divergent rows, weight deltas "
              f"{sorted(set(wdelta.tolist()))})",
              file=sys.stderr, flush=True)

    print("bench: compiling...", file=sys.stderr, flush=True)
    w, conv, iters = jitted(graph_dev, batches[0], llr0, consts, bp_ops)
    w.block_until_ready()
    print("bench: compiled, timing...", file=sys.stderr, flush=True)

    # variance pass: each dispatch synced (includes tunnel round-trip
    # latency, so it is NOT the headline), cycling distinct batches so any
    # result caching in the remote-device path cannot fake a hit
    times = []
    for s in range(STEPS):
        t0 = time.perf_counter()
        w, conv, iters = jitted(
            graph_dev, batches[s % DISTINCT], llr0, consts, bp_ops
        )
        w.block_until_ready()
        times.append(time.perf_counter() - t0)
    step_ms = np.asarray(times) * 1e3

    # headline pass: pipelined dispatches, one sync — device-limited
    # throughput without per-step host latency.  The barrier is a HOST
    # FETCH, not block_until_ready: through the remote-device tunnel the
    # latter can return before [B]-shaped outputs complete (bench_api.py
    # measured a 20x phantom inflation from exactly this).
    t0 = time.perf_counter()
    for s in range(STEPS):
        w, conv, iters = jitted(
            graph_dev, batches[s % DISTINCT], llr0, consts, bp_ops
        )
    np.asarray(w)
    elapsed = time.perf_counter() - t0

    syndromes_per_sec = STEPS * B / elapsed
    conv_frac = float(conv) / B
    mean_iters = float(iters) / B

    # ---- roofline accounting (per timed dispatch, analytic) -------------
    m_pad = -(-graph.m // 128) * 128
    n_pad = -(-graph.n // 128) * 128
    # BP matmul flops per sample-iteration with the GROUPED routing
    # operators (ops/pallas_bp.build_bp_operators): var->edge and
    # edge->var each contract [1, ngpad] x [ngpad, E_g] per group, plus
    # the syndrome-check matmul [1, n_pad] x [n_pad, m_pad] and the
    # [1, m_pad] x [m_pad, 128] convergence replication
    routing_macs = sum(
        op.shape[0] * op.shape[1]
        for key, op in bp_ops.items()
        if key.startswith("ev")
    ) if bp_ops else graph.wr * m_pad * n_pad
    flops_per_sample_iter = (
        2 * 2 * routing_macs + 2 * n_pad * m_pad + 2 * m_pad * 128
    )
    bp_flops = float(iters) * flops_per_sample_iter  # last dispatch
    # OSD pre-pass matmul (ops/pallas_osd._permuted_packed_h):
    # [m_pad, n_pad] x [n_pad, 2W*B]
    W32 = graph.num_words
    prepass_flops = 2 * m_pad * n_pad * 2 * W32 * B
    pct_mxu = (
        ((bp_flops + prepass_flops) / (elapsed / STEPS))
        / _V5E_F32_MATMUL_FLOPS
        if on_tpu else 0.0
    )

    bytes_bp_io = B * 4 * (m_pad + 2 * n_pad) + B * 4 * 4 * n_pad  # in+out
    # stage-2 resume adds a v2c state round trip [B, E] f32
    E_flat = sum(
        op.shape[1] for key, op in bp_ops.items() if key.startswith("ev")
    ) if bp_ops else graph.wr * m_pad
    bytes_v2c = 2 * B * 4 * E_flat
    bytes_osd_io = B * 4 * (
        graph.n + 2 * W32 * m_pad                   # perm in, Hp write+read
        + m_pad + 32 * W32 + 8                      # synd/pw/skip in
        + 2 * n_pad                                 # e0/ew out
    )
    bytes_total = 2 * bytes_bp_io + bytes_v2c + bytes_osd_io
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
                "osdw_row_agreement_pallas_vs_xla": osdw_row_agreement,
                "bp_conv_agreement_pallas_vs_xla": conv_agreement,
                "osd_kernels_exact_on_identical_llr": (
                    osdw_row_agreement is not None
                ),
                "batch": B,
                "steps": STEPS,
                "step_ms_mean": round(float(step_ms.mean()), 2),
                "step_ms_std": round(float(step_ms.std()), 2),
                "step_ms_min": round(float(step_ms.min()), 2),
                "step_ms_max": round(float(step_ms.max()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
