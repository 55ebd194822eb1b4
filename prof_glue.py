"""Micro-profile the reorder glue + BP block-size sweep on real TPU."""
import os
import time

import numpy as np

B = 8192
N = 400


def timeit(fn, *args, steps=10):
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

    r = np.random.default_rng(0)
    conv = jax.device_put(r.random(B) < 0.55)
    synd_u8 = jax.device_put(r.integers(0, 2, (B, N)).astype(np.uint8))
    synd_i32 = jax.device_put(np.asarray(synd_u8, np.int32))
    llr = jax.device_put(r.standard_normal((B, N)).astype(np.float32))

    t = timeit(jax.jit(lambda c: jnp.argsort(c.astype(jnp.int32), stable=True)), conv)
    print(f"argsort conv [B]: {t:.2f} ms")
    order = jnp.argsort(conv.astype(jnp.int32), stable=True)

    t = timeit(jax.jit(lambda o: jnp.argsort(o)), order)
    print(f"argsort order [B] (inverse): {t:.2f} ms")

    t = timeit(jax.jit(lambda o: jnp.zeros((B,), jnp.int32).at[o].set(jnp.arange(B, dtype=jnp.int32))), order)
    print(f"scatter inverse [B]: {t:.2f} ms")

    t = timeit(jax.jit(lambda s, o: s[o]), synd_u8, order)
    print(f"row gather [B,{N}] uint8: {t:.2f} ms")

    t = timeit(jax.jit(lambda s, o: s[o]), synd_i32, order)
    print(f"row gather [B,{N}] int32: {t:.2f} ms")

    t = timeit(jax.jit(lambda s, o: s[o]), llr, order)
    print(f"row gather [B,{N}] f32: {t:.2f} ms")

    t = timeit(jax.jit(lambda s, o: jnp.take(s, o, axis=0, unique_indices=True, indices_are_sorted=False)), llr, order)
    print(f"take unique [B,{N}] f32: {t:.2f} ms")

    # gather on transposed layout (lanes = batch)
    llr_t = jnp.asarray(llr).T.copy()
    t = timeit(jax.jit(lambda s, o: s[:, o]), llr_t, order)
    print(f"col gather [N,B] f32 (transposed): {t:.2f} ms")

    # sort key+payload together via lax.sort
    def sortall(c, s, l):
        key = c.astype(jnp.int32)
        out = jax.lax.sort((key, jnp.arange(B, dtype=jnp.int32)), num_keys=1)
        return out[1]
    t = timeit(jax.jit(sortall), conv, synd_i32, llr)
    print(f"lax.sort key+iota: {t:.2f} ms")

    # full glue as used in pipeline
    def glue(c, s, l):
        o = jnp.argsort(c.astype(jnp.int32), stable=True)
        inv = jnp.argsort(o)
        return s[o], l[o], inv
    t = timeit(jax.jit(glue), conv, synd_i32, llr)
    print(f"full glue (argsort+inv+2 gathers): {t:.2f} ms")

    # --- BP block sweep ---
    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.ops.pallas_bp import bp_decode_pallas, build_bp_operators

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    bp_ops = jax.device_put(build_bp_operators(graph))
    graph_dev = jax.device_put(graph)
    H = graph.H
    errors = (r.random((B, graph.n)) < 0.05).astype(np.uint8)
    synd = jax.device_put((errors @ H.T % 2).astype(np.uint8))
    llr0 = jax.device_put(
        np.broadcast_to(np.asarray(llr_from_channel(np.full(graph.n, 0.05))),
                        (B, graph.n)).copy())
    for blk in (128, 256, 512):
        try:
            fn = jax.jit(lambda g, o, s, l, b=blk: bp_decode_pallas(
                g, o, s, l, max_iter=32, bp_method="minimum_sum",
                ms_scaling_factor=0.0, block=b))
            t = timeit(fn, graph_dev, bp_ops, synd, llr0, steps=5)
            print(f"stage1 BP block={blk}: {t:.1f} ms")
        except Exception as e:
            print(f"stage1 BP block={blk}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
