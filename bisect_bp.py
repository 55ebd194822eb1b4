"""Compare XLA bp_decode vs pallas(interpret) staged pipeline conv fraction."""
import numpy as np

B = 256
P = 0.05


def main():
    import jax
    import jax.numpy as jnp

    from bp_osd_tpu.codes import hgp, mkmn_16_4_6
    from bp_osd_tpu.decoder import TannerGraph, llr_from_channel
    from bp_osd_tpu.decoder.bp import bp_decode
    from bp_osd_tpu.ops.pallas_bp import bp_decode_pallas, build_bp_operators

    qcode = hgp(mkmn_16_4_6())
    graph = TannerGraph(qcode.hx.toarray())
    H = graph.H
    r = np.random.default_rng(0)
    errors = (r.random((B, graph.n)) < P).astype(np.uint8)
    synd = (errors @ H.T % 2).astype(np.uint8)
    llr0 = np.broadcast_to(
        np.asarray(llr_from_channel(np.full(graph.n, P))), (B, graph.n)
    ).copy()

    xla = bp_decode(graph, synd, llr0, bp_method="minimum_sum",
                    max_iter=400, ms_scaling_factor=0.0)
    print("XLA conv:", int(jnp.sum(xla.converged)), "/", B,
          "mean it:", float(jnp.mean(xla.iterations)))

    ops = build_bp_operators(graph)
    # straight 400-iter pallas (interpret)
    h1, l1, c1, i1 = bp_decode_pallas(
        graph, ops, synd, llr0, bp_method="minimum_sum", max_iter=400,
        ms_scaling_factor=0.0, block=128, interpret=True)
    print("pallas400 conv:", int(jnp.sum(c1)),
          "mean it:", float(jnp.mean(i1)))
    print("agree with XLA conv flags:", bool(jnp.all(c1 == xla.converged)))

    # staged: 32 then re-decode failures at 400 (pipeline semantics)
    h, l, c, i = bp_decode_pallas(
        graph, ops, synd, llr0, bp_method="minimum_sum", max_iter=32,
        ms_scaling_factor=0.0, block=128, interpret=True)
    order = jnp.argsort(c.astype(jnp.int32), stable=True)
    inv = jnp.zeros((B,), jnp.int32).at[order].set(jnp.arange(B, dtype=jnp.int32))
    h2, l2, c2, i2 = bp_decode_pallas(
        graph, ops, jnp.asarray(synd)[order], jnp.asarray(llr0)[order],
        bp_method="minimum_sum", max_iter=400, ms_scaling_factor=0.0,
        block=128, skip=c[order], interpret=True)
    convf = c | c2[inv]
    print("staged conv:", int(jnp.sum(convf)))
    print("staged == straight400:", bool(jnp.all(convf == c1)))


if __name__ == "__main__":
    main()
