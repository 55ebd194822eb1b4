"""OSD timing with DISTINCT inputs per step (guards against any
remote-execution result caching of identical dispatches)."""
import os, time
import numpy as np

P, B, OSD_ORDER, STEPS = 0.05, 8192, 42, 6

def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph
    from bp_osd_tpu.ops.pallas_osd import (
        _osd_impl, _permuted_packed_h, _round_up, osd_cs_pallas)

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    graph_dev = jax.device_put(graph)
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    m_pad = _round_up(m, 128)
    lam = min(OSD_ORDER, n - r)

    rng = np.random.default_rng(3)
    llrs = [jax.device_put(rng.normal(size=(B, n)).astype(np.float32))
            for _ in range(STEPS)]
    synds = [jax.device_put(rng.integers(0, 2, (B, m)).astype(np.int32))
             for _ in range(STEPS)]
    skip = np.ones((B,), np.int32); skip[: B // 4] = 0
    skip = jax.device_put(skip)

    full = jax.jit(lambda g, p, s, sk: osd_cs_pallas(
        g, p, s, osd_order=OSD_ORDER, skip=sk))
    aso = jax.jit(lambda l: jnp.argsort(l, axis=1, stable=True).astype(jnp.int32))
    perms = [aso(l) for l in llrs]
    for p in perms: p.block_until_ready()

    # warm
    o = full(graph_dev, perms[0], synds[0], skip); o[0].block_until_ready()
    t0 = time.perf_counter()
    for i in range(STEPS):
        o = full(graph_dev, perms[i], synds[i], skip)
    o[0].block_until_ready()
    t_distinct = (time.perf_counter() - t0) / STEPS * 1e3
    t0 = time.perf_counter()
    for i in range(STEPS):
        o = full(graph_dev, perms[0], synds[0], skip)
    o[0].block_until_ready()
    t_same = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"osd_cs_pallas end-to-end: distinct={t_distinct:.2f} ms  same={t_same:.2f} ms")

    # kernel alone, distinct inputs
    n_pad = _round_up(n, 128)
    pp = jax.jit(lambda g, p: _permuted_packed_h(g, p, W, m_pad, n_pad))
    hts = [pp(graph_dev, p) for p in perms]
    for h in hts: h.block_until_ready()
    synd_ts = [jax.device_put(np.pad(np.asarray(s), ((0,0),(0,m_pad-m))).T.copy())
               for s in synds]
    skip_t = jax.device_put(np.broadcast_to(np.asarray(skip)[None,:], (8, B)).copy())
    def pwf(p):
        pw = jnp.pad(p, ((0, 0), (0, 32 * W - n)))
        return jnp.transpose(pw.reshape(B, W, 32), (1, 2, 0))
    perm_ws = [jax.jit(pwf)(p) for p in perms]
    kw = dict(n=n, m=m, W=W, r=r, lam=lam, lam_pad=_round_up(lam, 8),
              lamw=-(-lam // 32), block=128)
    ker = jax.jit(lambda h, s, sk, pw2: _osd_impl(h, s, sk, pw2, mode="cs", **kw))
    o = ker(hts[0], synd_ts[0], skip_t, perm_ws[0]); o[0].block_until_ready()
    t0 = time.perf_counter()
    for i in range(STEPS):
        o = ker(hts[i], synd_ts[i], skip_t, perm_ws[i])
    o[0].block_until_ready()
    print(f"kernel only distinct: {(time.perf_counter()-t0)/STEPS*1e3:.2f} ms")

    t0 = time.perf_counter()
    for i in range(STEPS):
        h = pp(graph_dev, perms[i])
    h.block_until_ready()
    print(f"prepass distinct: {(time.perf_counter()-t0)/STEPS*1e3:.2f} ms")

if __name__ == "__main__":
    main()
