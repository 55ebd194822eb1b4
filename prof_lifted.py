import os, time
import numpy as np
P_ERR, B = 0.005, 128
def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from bp_osd_tpu.codes import lifted_hgp
    from bp_osd_tpu.decoder import llr_from_channel
    from bp_osd_tpu.decoder.lifted_bp import LiftedGraph, bp_decode_lifted
    PROTO = [[(0,),(0,),(0,),(0,)],[(0,),(1,),(2,),(3,)],[(0,),(2,),(4,),(6,)]]
    qcode = lifted_hgp(PROTO, lift=400)
    H = np.asarray(qcode.hx.toarray(), np.uint8)
    lg = LiftedGraph(qcode.hx_proto, 400)
    n = lg.n
    rng = np.random.default_rng(0)
    synds = []
    for s in range(6):
        e = (rng.random((B, n)) < 0.5).astype(np.uint8)  # never converges
        synds.append(jax.device_put((e @ H.T % 2).astype(np.uint8)))
    llr0 = jax.device_put(np.broadcast_to(
        np.asarray(llr_from_channel(np.full(n, P_ERR))), (B, n)).copy())
    for mi in (10, 40):
        fn = jax.jit(lambda s, l, mi=mi: bp_decode_lifted(
            lg, s, l, bp_method="ms", max_iter=mi,
            ms_scaling_factor=0.625).converged.sum())
        o = fn(synds[0], llr0); o.block_until_ready()
        t0 = time.perf_counter()
        for i in range(6):
            o = fn(synds[i], llr0)
        o.block_until_ready()
        dt = (time.perf_counter()-t0)/6
        print(f"mi={mi}: {dt*1e3:.1f} ms/batch")
if __name__ == "__main__":
    main()
