"""Distinct-input timing of the pipeline's reorder glue: argsort of the
convergence flag, inverse permutation, and the row gathers that cluster
stage-2/OSD failures.  Identifies whether XLA TPU row-gathers are the
hidden cost of the staged pipeline."""

import os
import time

import numpy as np

B = 8192
E = 1792
N = 512
STEPS = 6


def bench(label, fn, args_list):
    out = fn(*args_list[0])
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()
    t0 = time.perf_counter()
    for i in range(STEPS):
        out = fn(*args_list[i])
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()
    print(f"{label}: {(time.perf_counter() - t0) / STEPS * 1e3:.2f} ms")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(5)
    convs = [jax.device_put((rng.random(B) < 0.55).astype(bool))
             for _ in range(STEPS)]
    synds = [jax.device_put(rng.integers(0, 2, (B, 192)).astype(np.uint8))
             for _ in range(STEPS)]
    llrs = [jax.device_put(rng.normal(size=(B, 400)).astype(np.float32))
            for _ in range(STEPS)]
    v2cs = [jax.device_put(rng.normal(size=(B, E)).astype(np.float32))
            for _ in range(STEPS)]
    orders = [jax.device_put(rng.permutation(B).astype(np.int32))
              for _ in range(STEPS)]

    aso = jax.jit(lambda c: jnp.argsort(c.astype(jnp.int32), stable=True))
    bench("argsort conv [B]", aso, [(c,) for c in convs])

    inv = jax.jit(lambda o: jnp.zeros((B,), jnp.int32).at[o].set(
        jnp.arange(B, dtype=jnp.int32)))
    bench("inverse scatter [B]", inv, [(o,) for o in orders])

    bench("gather synd u8 [B,192]", jax.jit(lambda s, o: s[o]),
          list(zip(synds, orders)))
    bench("gather llr f32 [B,400]", jax.jit(lambda s, o: s[o]),
          list(zip(llrs, orders)))
    bench("gather v2c f32 [B,1792]", jax.jit(lambda s, o: s[o]),
          list(zip(v2cs, orders)))

    def stage2_prep(conv, synd, llr, v2c):
        order = jnp.argsort(conv.astype(jnp.int32), stable=True)
        invp = jnp.zeros((B,), jnp.int32).at[order].set(
            jnp.arange(B, dtype=jnp.int32))
        return synd[order], llr[order], v2c[order], conv[order], invp

    bench("full stage2 prep", jax.jit(stage2_prep),
          list(zip(convs, synds, llrs, v2cs)))


if __name__ == "__main__":
    main()
