"""Time the OSD kernel + permutation-inverse variants on real TPU."""
import os
import time

import numpy as np

B = 8192
P = 0.05
OSD_ORDER = 42


def timeit(fn, *args, steps=6):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / steps * 1e3


def jax_block(out):
    if isinstance(out, (tuple, list)):
        for o in out:
            jax_block(o)
    else:
        out.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph
    from bp_osd_tpu.ops.pallas_osd import osd_cs_pallas

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    graph_dev = jax.device_put(graph)

    r = np.random.default_rng(0)
    # ~25% live samples clustered at the front (pipeline shape)
    skip = np.ones(B, np.int32)
    skip[: B // 4] = 0
    llr = r.standard_normal((B, graph.n)).astype(np.float32)
    perm = np.argsort(llr, axis=1, kind="stable").astype(np.int32)
    errors = (r.random((B, graph.n)) < P).astype(np.uint8)
    synd = (errors @ graph.H.T % 2).astype(np.int32)
    perm_d = jax.device_put(perm)
    synd_d = jax.device_put(synd)
    skip_d = jax.device_put(skip)
    llr_d = jax.device_put(llr)

    t = timeit(jax.jit(lambda p, s, sk: osd_cs_pallas(
        graph_dev, p, s, osd_order=OSD_ORDER, skip=sk)), perm_d, synd_d, skip_d)
    print(f"osd_cs_pallas NEW (auto block, 2048 live): {t:.1f} ms")

    # permutation-inverse variants [B, n]
    t = timeit(jax.jit(lambda p: jnp.argsort(p, axis=1).astype(jnp.int32)), perm_d)
    print(f"ppos via argsort [B,n]: {t:.2f} ms")
    n = graph.n

    def ppos_scatter(p):
        return (jnp.zeros((B, n), jnp.int32)
                .at[jnp.arange(B, dtype=jnp.int32)[:, None], p]
                .set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n))))
    t = timeit(jax.jit(ppos_scatter), perm_d)
    print(f"ppos via scatter [B,n]: {t:.2f} ms")

    # one-hot matmul inverse: ppos[b,c] = sum_i i * (perm[b,i]==c)
    def ppos_matmul(p):
        oh = jax.nn.one_hot(p, n, dtype=jnp.bfloat16)  # [B, n, n]... too big?
        return None
    # skip matmul variant (memory); try sort-of-pairs instead
    def ppos_sortpairs(p):
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n))
        _, pos = jax.lax.sort((p, iota), dimension=1, num_keys=1)
        return pos
    t = timeit(jax.jit(ppos_sortpairs), perm_d)
    print(f"ppos via lax.sort pairs [B,n]: {t:.2f} ms")

    # [B] inverse variants
    conv = jax.device_put((r.random(B) < 0.75))
    def inv_argsort(c):
        o = jnp.argsort(c.astype(jnp.int32), stable=True)
        return o, jnp.argsort(o)
    def inv_scatter(c):
        o = jnp.argsort(c.astype(jnp.int32), stable=True)
        return o, jnp.zeros((B,), jnp.int32).at[o].set(jnp.arange(B, dtype=jnp.int32))
    t = timeit(jax.jit(inv_argsort), conv)
    print(f"order+inv via argsort [B]: {t:.2f} ms")
    t = timeit(jax.jit(inv_scatter), conv)
    print(f"order+inv via scatter [B]: {t:.2f} ms")

    # llr argsort (the forward reliability sort)
    t = timeit(jax.jit(lambda l: jnp.argsort(l, axis=1, stable=True).astype(jnp.int32)), llr_d)
    print(f"llr argsort [B,n]: {t:.2f} ms")


if __name__ == "__main__":
    main()
