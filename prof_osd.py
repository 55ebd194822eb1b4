"""Fine-grained timing of the fused OSD path: pre-pass vs kernel vs glue."""

import os
import time

import numpy as np

P = 0.05
B = 8192
OSD_ORDER = 42


def timeit(fn, *args, steps=8):
    out = fn(*args)
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()
    return (time.perf_counter() - t0) / steps * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph
    from bp_osd_tpu.ops.pallas_osd import (
        _osd_cs_impl, _permuted_packed_h, _round_up, osd_cs_pallas,
    )

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    graph_dev = jax.device_put(graph)
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    m_pad = _round_up(m, 128)
    k = n - r
    lam = min(OSD_ORDER, k)

    rng = np.random.default_rng(3)
    llr = jax.device_put(rng.normal(size=(B, n)).astype(np.float32))
    synd = jax.device_put(rng.integers(0, 2, (B, m)).astype(np.int32))
    # 25% live, clustered first (the pipeline's shape)
    skip = np.ones((B,), np.int32)
    skip[: B // 4] = 0
    skip = jax.device_put(skip)

    t_perm, perm = timeit(
        jax.jit(lambda l: jnp.argsort(l, axis=1, stable=True).astype(jnp.int32)),
        llr)
    print(f"argsort llr: {t_perm:.2f} ms")

    pp = jax.jit(lambda g, p: _permuted_packed_h(g, p, W, m_pad))
    t_pp, hp = timeit(pp, graph_dev, perm)
    print(f"permuted_packed_h: {t_pp:.2f} ms")

    tr = jax.jit(lambda h: jnp.transpose(h, (1, 2, 0)))
    t_tr, h_t = timeit(tr, hp)
    print(f"transpose [B,W,m]->[W,m,B]: {t_tr:.2f} ms")

    synd_t = jnp.pad(synd, ((0, 0), (0, m_pad - m))).T
    skip_t = jnp.broadcast_to(skip[None, :], (8, B))
    synd_t, skip_t = jax.device_put(synd_t), jax.device_put(skip_t)

    kw = dict(n=n, m=m, W=W, r=r, lam=lam, lam_pad=_round_up(lam, 8),
              lamw=-(-lam // 32), block=128)
    ker = jax.jit(lambda h, s, sk: _osd_cs_impl(h, s, sk, **kw))
    t_k, _ = timeit(ker, h_t, synd_t, skip_t)
    print(f"osd_cs kernel only (25% live): {t_k:.2f} ms")

    full = jax.jit(lambda g, p, s, sk: osd_cs_pallas(
        g, p, s, osd_order=OSD_ORDER, skip=sk))
    t_f, _ = timeit(full, graph_dev, perm, synd, skip)
    print(f"osd_cs_pallas end-to-end: {t_f:.2f} ms")


if __name__ == "__main__":
    main()
