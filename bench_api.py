"""Driver-style bench of the DROP-IN class path (``BpOsdDecoder``).

Round-3 VERDICT weak item 2: the fast path was unreachable from the API
reference users actually call — ``BpOsdDecoder(...).decode_batch`` ran
straight max_iter Pallas BP.  Round 4 routed the class through the staged
``decode_pipeline``; round 5 made every knob default-correct (backend
"auto" -> pallas on TPU, TPU-sized chunk, auto (24, 96) schedule), so
this script constructs the decoder with NO backend/chunk arguments at all
— the literal out-of-the-box path — and must land within ~10% of
``bench.py``'s headline (measured 97.6%).

Measurement discipline matches ``bench.py`` (see
memory: tunnel RTT / dedup gotchas): syndromes pre-uploaded to device,
distinct batches cycled, dispatches pipelined with ONE final sync, and
``outputs="device"`` so no [B, n] arrays cross the host link inside the
timed loop (the weight reduction pulls [B] scalars only).

Prints one JSON line (not the driver headline — recorded in BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

P = 0.05
MAX_ITER = 400
OSD_ORDER = 42
B = 16384
STEPS = 24
# every timed dispatch gets a DISTINCT batch with RUN-UNIQUE seeds: the
# remote-device path caches (program, input)->result ACROSS PROCESSES
# (a scaling probe saw 6 previously-run batches "decode" in 15 ms), so
# reusing fixed seeds between runs inflates the number 3-5x.  With
# unique seeds the steady-state measurement reproduces bench.py's
# headline within ~1-2% (N=24: 180.8k, N=36: 183.3k vs 183.8k).
DISTINCT = 24


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

    from bp_osd_tpu import BpOsdDecoder
    from bp_osd_tpu.codes import hgp, mkmn_16_4_6

    qcode = hgp(mkmn_16_4_6())
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    on_tpu = jax.devices()[0].platform != "cpu"

    # NO backend= and NO chunk_size= anywhere below: this measures the
    # out-of-the-box defaults a reference user gets (backend="auto" ->
    # pallas on TPU, decode_batch chunk auto -> 16384) — round-4 VERDICT
    # weak item 4's acceptance run
    dec = BpOsdDecoder(
        H, error_rate=P, max_iter=MAX_ITER, bp_method="ms",
        ms_scaling_factor=0.0, osd_method="osd_cs", osd_order=OSD_ORDER,
    )

    def make_batch(seed):
        r = np.random.default_rng(seed)
        errors = (r.random((B, H.shape[1])) < P).astype(np.uint8)
        return (errors @ H.T % 2).astype(np.uint8)

    nonce = (os.getpid() * 7919 + int(time.time())) % (1 << 20)
    batches = [jax.device_put(make_batch(nonce * 64 + s))
               for s in range(DISTINCT)]
    wsum = jax.jit(lambda x: jnp.sum(x, axis=1))
    # ONE jitted reduction for the final barrier: a chain of eager ops
    # (astype/sum/add per step) dispatches ~70 tiny programs through the
    # remote tunnel and can cost seconds EACH — a measured 50x slowdown
    total_fn = jax.jit(
        lambda ws: jnp.sum(jnp.stack(ws).astype(jnp.int32))
    )

    print("bench_api: compiling...", file=sys.stderr, flush=True)
    dec.decode_batch(batches[0], outputs="device")
    w0 = wsum(dec.osdw_decoding_batch)
    int(np.asarray(total_fn([w0] * STEPS)))  # compile barrier program too

    print("bench_api: timing...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    weights = []
    for s in range(STEPS):
        dec.decode_batch(batches[s % DISTINCT], outputs="device")
        weights.append(wsum(dec.osdw_decoding_batch))
    # the completion barrier must be ONE HOST FETCH of a device-side
    # scalar: through the remote-device tunnel, block_until_ready on
    # [B]-shaped arrays can return before the dispatches complete (a
    # 24-step pass "finished" in 0.098 s with values landing only during
    # the later np.asarray — a 20x phantom rate), while fetching the 24
    # weight arrays one-by-one serializes ~24 tunnel round trips into the
    # measurement (~2x slowdown).  Reduce on device in ONE jitted
    # program, fetch one scalar.
    total_weight = int(np.asarray(total_fn(weights)))
    elapsed = time.perf_counter() - t0

    synd_per_sec = STEPS * B / elapsed
    print(json.dumps({
        "metric": "syndromes_per_sec_BpOsdDecoder_decode_batch_flagship",
        "value": round(synd_per_sec, 1),
        "unit": "syndromes/s/chip",
        "batch": B,
        "steps": STEPS,
        "total_weight": total_weight,
        "conv_frac": round(float(jnp.mean(
            dec.converge_batch.astype(jnp.float32))), 4),
    }))


if __name__ == "__main__":
    main()
