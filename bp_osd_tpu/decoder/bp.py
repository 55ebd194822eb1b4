"""Batched belief-propagation syndrome decoding over a Tanner graph.

TPU-native re-design of the reference's native BP engine (interface contract
at reference ``README.md:184`` and ``css_decode_sim.py:444-463``): instead of
one mutable decoder object processing one syndrome per call, decoding is a
pure function ``(syndromes [B, m], llr0 [B, n]) -> BPResult`` compiled once
and vmapped-by-construction over the batch axis.

Supported schedules (parallel / flooding):

- ``minimum_sum`` with fixed scaling factor, or the *variable* scaling
  method ``alpha_t = 1 - 2**-t`` when ``ms_scaling_factor == 0``
  (reference ``README.md:184``: "If set to zero the variable scaling factor
  method is used").
- ``product_sum`` (tanh rule) with numerically exact exclusive products via
  forward/backward cumulative products.

Per-sample convergence is checked every iteration (hard decision satisfies
the syndrome); outputs freeze at first convergence, matching the native
decoder's early-exit semantics, while the batch keeps iterating inside a
``lax.while_loop`` until every sample converged or ``max_iter`` is reached.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tanner import TannerGraph

__all__ = ["BPResult", "bp_decode", "llr_from_channel", "MIN_SUM_METHODS", "PROD_SUM_METHODS"]

MIN_SUM_METHODS = frozenset(
    {"minimum_sum", "min_sum", "ms", "minimum_sum_log", "1"}
)
PROD_SUM_METHODS = frozenset(
    {"product_sum", "prod_sum", "ps", "product_sum_log", "0"}
)

_P_CLIP = 1e-30  # channel probabilities clamped away from {0, 1}
_TANH_CLIP = 1.0 - 1e-7  # product-sum atanh domain guard (f32)


def normalize_bp_method(bp_method) -> str:
    key = str(bp_method).lower()
    if key in MIN_SUM_METHODS:
        return "minimum_sum"
    if key in PROD_SUM_METHODS:
        return "product_sum"
    raise ValueError(
        f"unknown bp_method {bp_method!r}; choose minimum_sum/ms or product_sum/ps"
    )


def llr_from_channel(probs) -> jnp.ndarray:
    """Channel error probabilities -> prior log-likelihood ratios.

    ``llr = log((1-p)/p)``; positive means "probably no error".  Probabilities
    are clamped so zero-probability channels (e.g. the pure-Z bias of the
    flagship benchmark, reference ``examples/qldpc_decode_example.py:11``)
    produce large finite priors instead of infinities.
    """
    p = jnp.clip(jnp.asarray(probs, jnp.float32), _P_CLIP, 1.0 - 1e-7)
    return jnp.log1p(-p) - jnp.log(p)


class BPResult(NamedTuple):
    hard: jnp.ndarray  # [B, n] uint8 hard decision at freeze point
    llr: jnp.ndarray  # [B, n] f32 posterior log-prob ratios at freeze point
    converged: jnp.ndarray  # [B] bool
    iterations: jnp.ndarray  # [B] int32 iteration of first convergence (or last)


# finite +inf stand-in (friendlier to the TPU AOT compiler); python float —
# a module-level jnp scalar would initialize the XLA backend at import time,
# which breaks jax.distributed.initialize() ordering on multi-host
_BIG = 1e30


def _check_update_min_sum(v2c, chk_mask, syn_sign, alpha):
    """Scaled min-sum check-node update with self-exclusion via min1/min2.

    Sign products are computed as integer parities of negative-message
    counts and the argmin mask as an iota comparison — pure VPU-friendly
    primitives.
    """
    wr = v2c.shape[-1]
    neg = ((v2c < 0) & chk_mask).astype(jnp.int32)
    neg_total = jnp.sum(neg, axis=-1, keepdims=True)
    excl_sgn = (1 - 2 * ((neg_total - neg) & 1)).astype(jnp.float32)
    mag = jnp.where(chk_mask, jnp.abs(v2c), _BIG)
    min1 = jnp.min(mag, axis=-1, keepdims=True)
    amin = jnp.argmin(mag, axis=-1, keepdims=True)
    slot = jax.lax.broadcasted_iota(jnp.int32, v2c.shape, v2c.ndim - 1)
    is_min = slot == amin
    min2 = jnp.min(jnp.where(is_min, _BIG, mag), axis=-1, keepdims=True)
    excl_min = jnp.where(is_min, min2, min1)
    # Saturate at _BIG: unscaled min-sum magnitudes grow ~x2/iteration and
    # overflow f32 around iteration ~130 (inf - inf -> NaN, destroying the
    # OSD reliability order of exactly the never-converging rows OSD must
    # rescue).  The serial C++ baseline saturates at 1e30 by construction
    # (its min1/min2 seeds, native/cpu_baseline.cpp:130); capping here
    # makes every implementation saturate identically while preserving the
    # relative order of all sub-cap magnitudes.  The reference's double
    # engine doesn't overflow in 400 iterations — see PARITY.md
    # "Message saturation".
    excl_min = jnp.minimum(excl_min, _BIG)
    return syn_sign * excl_sgn * alpha * excl_min


def _check_update_product_sum(v2c, chk_mask, syn_sign):
    """Tanh-rule check-node update with exact exclusive products."""
    t = jnp.tanh(0.5 * v2c)
    t = jnp.where(chk_mask, t, 1.0)
    ones = jnp.ones_like(t[..., :1])
    fwd = jnp.concatenate([ones, jnp.cumprod(t, axis=-1)[..., :-1]], axis=-1)
    rt = jnp.flip(t, axis=-1)
    bwd = jnp.flip(
        jnp.concatenate([ones, jnp.cumprod(rt, axis=-1)[..., :-1]], axis=-1),
        axis=-1,
    )
    excl = jnp.clip(syn_sign * fwd * bwd, -_TANH_CLIP, _TANH_CLIP)
    return 2.0 * jnp.arctanh(excl)


def bp_decode(
    graph: TannerGraph,
    syndromes,
    llr0,
    *,
    bp_method: str = "minimum_sum",
    max_iter: int = 0,
    ms_scaling_factor: float = 0.625,
) -> BPResult:
    """Decode a batch of syndromes on ``graph``; fully jit-compatible.

    ``max_iter == 0`` falls back to the block length ``n``, the native
    decoder's convention (reference ``README.md:183`` recommends
    ``max_iter=N``; the sim default is 0 at reference
    ``css_decode_sim.py:72``).
    """
    method = normalize_bp_method(bp_method)
    if max_iter == 0:
        max_iter = graph.n

    m, n, wr = graph.m, graph.n, graph.wr
    chk_var = jnp.asarray(graph.chk_var)
    chk_mask = jnp.asarray(graph.chk_mask)
    var_edge = jnp.asarray(graph.var_edge)
    var_mask = jnp.asarray(graph.var_mask)

    syndromes = jnp.asarray(syndromes)
    if syndromes.ndim == 1:
        syndromes = syndromes[None, :]
    B = syndromes.shape[0]
    synd = syndromes.astype(jnp.int32)
    syn_sign = (1.0 - 2.0 * synd.astype(jnp.float32))[:, :, None]  # [B, m, 1]

    llr0 = jnp.asarray(llr0, jnp.float32)
    llr0 = jnp.broadcast_to(llr0, (B, n))

    fixed_alpha = float(ms_scaling_factor)
    adaptive = method == "minimum_sum" and fixed_alpha == 0.0

    M = graph.edge_var_onehot  # [m*wr, n] one-hot (None for large graphs)

    if M is not None:
        # matmul formulation: every gather/segment-sum rides the MXU
        def var_to_edge(x):  # [B, n] -> [B, m, wr]
            return jnp.einsum(
                "bn,en->be", x, M, preferred_element_type=jnp.float32
            ).reshape(B, m, wr)

        v2c0 = var_to_edge(llr0)

        def syndrome_of(hard):
            bits = var_to_edge(hard.astype(jnp.float32))
            return jnp.sum(bits, axis=-1).astype(jnp.int32) & 1

        def variable_update(c2v):
            per_var = jnp.einsum(
                "be,en->bn",
                c2v.reshape(B, m * wr),
                M,
                preferred_element_type=jnp.float32,
            )
            total = llr0 + per_var
            v2c_next = var_to_edge(total) - c2v
            return total, v2c_next

    else:
        llr0_pad = jnp.pad(llr0, ((0, 0), (0, 1)))
        v2c0 = llr0_pad[:, chk_var]  # [B, m, wr]

        def syndrome_of(hard):
            hard_pad = jnp.pad(hard, ((0, 0), (0, 1)))
            bits = jnp.where(chk_mask, hard_pad[:, chk_var], 0)
            return jnp.sum(bits, axis=-1) & 1

        def variable_update(c2v):
            c2v_flat = c2v.reshape(B, m * wr)
            c2v_flat = jnp.pad(c2v_flat, ((0, 0), (0, 1)))
            gathered = c2v_flat[:, var_edge]  # [B, n, wc]
            gathered = jnp.where(var_mask, gathered, 0.0)
            total = llr0 + jnp.sum(gathered, axis=-1)
            total_pad = jnp.pad(total, ((0, 0), (0, 1)))
            v2c_next = total_pad[:, chk_var] - c2v
            return total, v2c_next

    def body(state):
        it, v2c, hard_out, llr_out, iters, converged = state
        if method == "minimum_sum":
            alpha = (
                1.0 - jnp.exp2(-it.astype(jnp.float32))
                if adaptive
                else fixed_alpha
            )
            c2v = _check_update_min_sum(v2c, chk_mask, syn_sign, alpha)
        else:
            c2v = _check_update_product_sum(v2c, chk_mask, syn_sign)
        total, v2c_next = variable_update(c2v)
        hard = (total <= 0).astype(jnp.int32)
        ok = jnp.all(syndrome_of(hard) == synd, axis=-1)
        live = ~converged  # not yet converged: keep updating outputs
        hard_out = jnp.where(live[:, None], hard, hard_out)
        llr_out = jnp.where(live[:, None], total, llr_out)
        iters = jnp.where(live, it, iters)
        converged = converged | ok
        return it + 1, v2c_next, hard_out, llr_out, iters, converged

    def cond(state):
        it, _, _, _, _, converged = state
        return (it <= max_iter) & ~jnp.all(converged)

    init = (
        jnp.int32(1),
        v2c0,
        jnp.zeros((B, n), jnp.int32),
        llr0,
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
    )
    _, _, hard_out, llr_out, iters, converged = jax.lax.while_loop(
        cond, body, init
    )
    return BPResult(
        hard=hard_out.astype(jnp.uint8),
        llr=llr_out,
        converged=converged,
        iterations=iters,
    )
