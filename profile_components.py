"""Component-level timing of the flagship decode dispatch on real TPU.

Times each stage of ``decoder/pipeline.decode_pipeline`` separately at the
bench workload (B=8192, reference semantics) so optimization effort lands
on the measured bottleneck, not the assumed one.
"""

import os
import time

import numpy as np

P = 0.05
B = 8192
STAGE1 = 32
MAX_ITER = 400
OSD_ORDER = 42


def timeit(fn, *args, steps=6, **kw):
    """Per-call ms.  The completion barrier is a host fetch of the first
    output's leading element — through the remote tunnel,
    block_until_ready can return before array outputs complete (round-4
    finding, see bench.py), silently faking the timing.  NOTE: repeated
    identical dispatches can also be served from a cross-process result
    cache; component numbers here are best treated as SAME-RUN relative
    weights, not absolutes."""
    def barrier(o):
        first = o[0] if isinstance(o, tuple) else o
        np.asarray(first.ravel()[:1])  # slice on device, fetch 1 element

    out = fn(*args, **kw)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, **kw)
    barrier(out)
    return (time.perf_counter() - t0) / steps * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.decoder.osd import build_osd_consts, osd_decode
    from bp_osd_tpu.ops.pallas_bp import bp_decode_pallas, build_bp_operators
    from bp_osd_tpu.ops.pallas_osd import osd_cs_pallas

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    consts = jax.device_put(build_osd_consts(graph, "osd_cs", OSD_ORDER))
    bp_ops = jax.device_put(build_bp_operators(graph))
    graph_dev = jax.device_put(graph)
    H = graph.H

    r = np.random.default_rng(0)
    errors = (r.random((B, graph.n)) < P).astype(np.uint8)
    synd = jax.device_put((errors @ H.T % 2).astype(np.uint8))
    llr0 = jax.device_put(
        np.broadcast_to(np.asarray(llr_from_channel(np.full(graph.n, P))),
                        (B, graph.n)).copy())

    kw = dict(bp_method="minimum_sum", ms_scaling_factor=0.0, block=128)

    # --- stage 1 BP ---
    s1 = jax.jit(lambda g, o, s, l: bp_decode_pallas(
        g, o, s, l, max_iter=STAGE1, **kw))
    t_s1, (hard, llr, conv, iters) = timeit(s1, graph_dev, bp_ops, synd, llr0)
    conv.block_until_ready()
    nfail = int(B - jnp.sum(conv))
    print(f"stage1 BP (32 it, B={B}): {t_s1:.1f} ms   fail={nfail}")

    # --- reorder glue (argsort conv + gathers) ---
    def reorder(conv, synd, llr0):
        order = jnp.argsort(conv.astype(jnp.int32), stable=True)
        inv = jnp.argsort(order)
        return synd[order], llr0[order], conv[order], inv
    t_g, (synd_o, llr0_o, conv_o, inv) = timeit(jax.jit(reorder), conv, synd, llr0)
    print(f"reorder glue: {t_g:.2f} ms")

    # --- stage 2 BP (failures clustered, full 400) ---
    s2 = jax.jit(lambda g, o, s, l, sk: bp_decode_pallas(
        g, o, s, l, max_iter=MAX_ITER, skip=sk, **kw))
    t_s2, (h2, l2, c2, i2) = timeit(s2, graph_dev, bp_ops, synd_o, llr0_o, conv_o)
    print(f"stage2 BP (400 it, {nfail} fails clustered): {t_s2:.1f} ms")

    # --- OSD full (pallas backend incl. sorts) ---
    conv_f = conv | c2[inv]
    llr_f = jnp.where((~conv)[:, None], l2[inv], llr)
    def osd_full(g, s, l, c, consts):
        order = jnp.argsort(c.astype(jnp.int32), stable=True)
        inv2 = jnp.argsort(order)
        o = osd_decode(g, s[order], l[order], osd_method="osd_cs",
                       osd_order=OSD_ORDER, consts=consts, backend="pallas",
                       skip=c[order])
        return o.osdw[inv2], o.osd0[inv2]
    t_osd, _ = timeit(jax.jit(osd_full), graph_dev, synd, llr_f, conv_f, consts)
    nfail2 = int(B - jnp.sum(conv_f))
    print(f"OSD full ({nfail2} fails): {t_osd:.1f} ms")

    # --- OSD sub-steps ---
    order = jnp.argsort(conv_f.astype(jnp.int32), stable=True)
    synd_o2, llr_o2, skip_o2 = synd[order], llr_f[order], conv_f[order]
    t_sort, perm = timeit(
        jax.jit(lambda l: jnp.argsort(l, axis=1, stable=True).astype(jnp.int32)),
        llr_o2)
    print(f"  llr argsort [B,n]: {t_sort:.2f} ms")
    t_ppos, _ = timeit(
        jax.jit(lambda p: jnp.argsort(p, axis=1).astype(jnp.int32)), perm)
    print(f"  ppos argsort [B,n]: {t_ppos:.2f} ms")
    t_k, _ = timeit(
        jax.jit(lambda p, s, sk: osd_cs_pallas(
            graph_dev, p, s, osd_order=OSD_ORDER, skip=sk)),
        perm, synd_o2, skip_o2)
    print(f"  osd_cs_pallas (incl ppos+scatters): {t_k:.1f} ms")

    # --- bf16 stage 2 ---
    s2b = jax.jit(lambda g, o, s, l, sk: bp_decode_pallas(
        g, o, s, l, max_iter=MAX_ITER, skip=sk, msg_dtype="bfloat16", **kw))
    t_s2b, (h2b, l2b, c2b, i2b) = timeit(s2b, graph_dev, bp_ops, synd_o, llr0_o, conv_o)
    print(f"stage2 BP bf16: {t_s2b:.1f} ms   (f32 conv {int(jnp.sum(c2))} vs bf16 {int(jnp.sum(c2b))})")

    # --- bf16 stage 1 ---
    s1b = jax.jit(lambda g, o, s, l: bp_decode_pallas(
        g, o, s, l, max_iter=STAGE1, msg_dtype="bfloat16", **kw))
    t_s1b, (_, _, convb, _) = timeit(s1b, graph_dev, bp_ops, synd, llr0)
    print(f"stage1 BP bf16: {t_s1b:.1f} ms   fail={int(B - jnp.sum(convb))}")

    total = t_s1 + t_g + t_s2 + t_osd
    print(f"sum of parts: {total:.1f} ms -> {B/total*1000:.0f} synd/s")


if __name__ == "__main__":
    main()
