"""Pallas TPU kernel: fused batched min-sum/product-sum BP decode loop.

The XLA BP path (``decoder/bp.py``) round-trips messages through HBM every
iteration.  This kernel keeps the whole message state ``[BS, wr, m_pad]``
resident in VMEM for a block of samples and runs the entire iteration loop
in one program: per iteration it does two small MXU matmuls (edge<->variable
one-hot operators) and a handful of VPU passes, with HBM traffic only at
entry/exit.

Layout: check rows on the lane axis (``m_pad`` = multiple of 128), message
slots on the sublane axis (``wr``).  The flat edge index is slot-major
(``e = j * m_pad + i``), matching the one-hot operators built in
:func:`build_bp_operators`.

Semantics match ``decoder.bp.bp_decode`` (parallel schedule, per-sample
freeze at first convergence, adaptive min-sum scaling for
``ms_scaling_factor == 0``); small float differences are possible because
variable-node sums accumulate in a different order (matmul vs gather-sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..decoder.bp import normalize_bp_method

__all__ = ["build_bp_operators", "bp_decode_pallas"]

_BIG = 1e30  # python float: module-level jnp scalars become captured constants
_TANH_CLIP = 1.0 - 1e-7


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def build_bp_operators(graph):
    """Host-built dense operators for the fused BP kernel.

    Returns dict of np arrays:
      edge_var [wr*m_pad, n_pad] f32 one-hot: edge e -> its variable
      h_t      [n_pad, m_pad]    f32: H^T (variable -> check incidence)
      mask     [wr, m_pad]       f32: 1 on real (check, slot) pairs
    """
    m, n, wr = graph.m, graph.n, graph.wr
    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, 128)

    edge_var = np.zeros((wr * m_pad, n_pad), dtype=np.float32)
    rows, slots = np.nonzero(graph.chk_mask)
    cols = graph.chk_var[rows, slots]
    edge_var[slots * m_pad + rows, cols] = 1.0

    h_t = np.zeros((n_pad, m_pad), dtype=np.float32)
    h_t[:n, :m] = graph.H.T

    mask = np.zeros((wr, m_pad), dtype=np.float32)
    mask[slots, rows] = 1.0
    return {"edge_var": edge_var, "h_t": h_t, "mask": mask}


def _bp_kernel(synd_ref, llr0_ref, skip_ref, ev_ref, ht_ref, mask_ref,
               hard_ref, llr_ref, conv_ref, iters_ref,
               *, method, max_iter, alpha_fixed, wr, m_pad, n_pad, BS,
               msg_dtype=jnp.float32):
    """``msg_dtype=bfloat16`` quantizes messages at each MXU selection
    (the one-hot operators are 0/1 — exact in bf16; only the message
    VALUES round) for ~3x matmul throughput; f32 is the reference-parity
    default.  All accumulation stays f32 either way."""
    synd = synd_ref[:, :].astype(jnp.float32)  # [BS, m_pad]
    syn_bit = synd_ref[:, :][:, None, :]  # [BS, 1, m_pad] int 0/1
    llr0 = llr0_ref[:, :]  # [BS, n_pad]
    ev = ev_ref[:, :]  # [E, n_pad] (msg_dtype)
    ht = ht_ref[:, :]  # [n_pad, m_pad] (msg_dtype)
    mask = mask_ref[:, :][None]  # [1, wr, m_pad]
    maskb = mask > 0
    mask_i = maskb.astype(jnp.int32)
    # masked slots get +inf-class magnitude bits via OR (cheaper than select)
    big_i = jnp.where(maskb, 0, jnp.int32(0x7F000000))

    E = wr * m_pad

    def var_to_edge(x):  # [BS, n_pad] -> [BS, wr, m_pad]
        flat = jax.lax.dot_general(
            x.astype(msg_dtype), ev, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BS, E]
        return flat.reshape(BS, wr, m_pad)

    def edge_to_var(msgs):  # [BS, wr, m_pad] -> [BS, n_pad]
        return jnp.dot(
            msgs.reshape(BS, E).astype(msg_dtype), ev,
            preferred_element_type=jnp.float32,
        )

    v2c0 = var_to_edge(llr0)

    def check_update(v2c, it):
        if method == "minimum_sum":
            # NOTE: an integer sign/magnitude variant (bitcast + abs-bit
            # compares) was tried here — interpret-mode exact, but on real
            # TPU it shifted the converged fraction by -6.6 points (raw-bit
            # tests see values the float datapath flushes/normalizes
            # differently), so the float formulation stays.
            syn_sign = (1.0 - 2.0 * synd)[:, None, :]  # [BS, 1, m_pad]
            neg = ((v2c < 0) & maskb).astype(jnp.float32)
            neg_total = jnp.sum(neg, axis=1, keepdims=True)
            excl_sgn = 1.0 - 2.0 * jnp.mod(neg_total - neg, 2.0)
            mag = jnp.where(maskb, jnp.abs(v2c), _BIG)
            min1 = jnp.min(mag, axis=1, keepdims=True)
            # first-minimum mask without argmin/cumsum (neither lowers in
            # Mosaic): min-reduce the slot index over ties
            slot = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
            idx_at_min = jnp.min(
                jnp.where(mag == min1, slot, wr), axis=1, keepdims=True
            )
            is_min = slot == idx_at_min
            min2 = jnp.min(jnp.where(is_min, _BIG, mag), axis=1, keepdims=True)
            excl_min = jnp.where(is_min, min2, min1)
            if alpha_fixed == 0.0:
                alpha = 1.0 - jnp.exp2(-it.astype(jnp.float32))
            else:
                alpha = alpha_fixed
            return syn_sign * excl_sgn * alpha * excl_min
        else:  # product_sum
            syn_sign = (1.0 - 2.0 * synd)[:, None, :]  # [BS, 1, m_pad]
            t = jnp.tanh(0.5 * v2c)
            t = jnp.where(maskb, t, 1.0)
            # exclusive products unrolled over the (small, static) slot
            # axis — cumprod/flip do not lower in Mosaic
            ones = jnp.ones_like(t[:, :1, :])
            fwd = [ones]
            for j in range(wr - 1):
                fwd.append(fwd[-1] * t[:, j : j + 1, :])
            bwd = [ones]
            for j in range(wr - 1, 0, -1):
                bwd.insert(0, bwd[0] * t[:, j : j + 1, :])
            excl = jnp.concatenate(
                [fwd[j] * bwd[j] for j in range(wr)], axis=1
            )
            excl = jnp.clip(syn_sign * excl, -_TANH_CLIP, _TANH_CLIP)
            # 2*atanh(x) = log((1+x)/(1-x)); atanh has no Mosaic lowering
            return jnp.log((1.0 + excl) / (1.0 - excl))

    # conv/iters are carried at FULL lane width [BS, n_pad]: Mosaic cannot
    # round-trip width-1 loop carries whose update mixes a keepdims-reduce
    # layout ({0,*}) with the replicated entry layout ({*,*}).  The
    # per-sample mismatch count is replicated across all n_pad lanes via an
    # MXU matmul against a ones matrix, so every flag keeps a plain tiled
    # layout and broadcasts against [BS, n_pad] tensors for free.
    ones_mn = jnp.ones((m_pad, n_pad), msg_dtype)

    def body(state):
        it, v2c, hard_out, llr_out, iters, conv = state
        c2v = check_update(v2c, it)
        c2v = jnp.where(maskb, c2v, 0.0)
        total = llr0 + edge_to_var(c2v)
        v2c_next = var_to_edge(total) - c2v
        hard = (total <= 0).astype(jnp.float32)
        synd_hat = jnp.mod(
            jnp.dot(hard.astype(msg_dtype), ht,
                    preferred_element_type=jnp.float32),
            2.0,
        )
        neq = (synd_hat != synd).astype(msg_dtype)  # [BS, m_pad]
        miss = jnp.dot(neq, ones_mn, preferred_element_type=jnp.float32)
        ok = (miss == 0.0).astype(jnp.float32)  # [BS, n_pad] replicated
        # valid: the loop runs in CHUNK-iteration bursts between exit
        # checks, so the body can overrun max_iter — those steps must not
        # touch outputs or convergence
        valid = it <= max_iter
        live = (conv == 0.0) & valid  # [BS, n_pad] bool
        hard_out = jnp.where(live, hard, hard_out)
        llr_out = jnp.where(live, total, llr_out)
        # iters := it while live; `it` advances by 1 per live step so this
        # running sum is identical and avoids a dynamic-scalar select
        iters = iters + live.astype(jnp.float32)
        conv = jnp.maximum(conv, jnp.where(valid, ok, 0.0))
        return it + 1, v2c_next, hard_out, llr_out, iters, conv

    def cond(state):
        it = state[0]
        conv = state[5]
        return (it <= max_iter) & (jnp.min(conv) == 0.0)

    # the exit test is a 65k-element cross-lane reduction plus a scalar
    # sync; checking it every iteration costs more than the iterations it
    # saves, so run CHUNK iterations per check (overrun steps are no-ops
    # via the `valid` gate above).  Long runs (the staged max_iter=N
    # re-decode, whose blocks almost always contain a never-converging
    # sample) check 4x less often — the early exit there only matters for
    # all-skip blocks, which still leave before the first real iteration.
    CHUNK = 8 if max_iter <= 64 else 32

    def chunk(state):
        return jax.lax.fori_loop(0, CHUNK, lambda _, s: body(s), state)

    # carry inits derived from llr0 (not jnp.zeros): a splat constant gets
    # the replicated {*,*} layout, the body's updates are tiled {0,0}, and
    # Mosaic cannot relayout tiled -> replicated at the loop back-edge.
    # conv starts at the (lane-replicated) skip flags: skipped samples are
    # born "converged", so an all-skip block exits before iteration one.
    zeros_bn = llr0 * 0.0
    init = (
        jnp.int32(1),
        v2c0,
        zeros_bn,
        llr0,
        zeros_bn,
        skip_ref[:, :].astype(jnp.float32),
    )
    _, _, hard_out, llr_out, iters, conv = jax.lax.while_loop(cond, chunk, init)

    hard_ref[:, :] = hard_out.astype(jnp.int32)
    llr_ref[:, :] = llr_out
    conv_ref[:, :] = conv.astype(jnp.int32)
    iters_ref[:, :] = iters.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("method", "max_iter", "alpha_fixed", "wr", "m_pad",
                     "n_pad", "block", "interpret", "msg_dtype"),
)
def _bp_pallas_impl(synd, llr0, skip, ev, ht, mask,
                    *, method, max_iter, alpha_fixed, wr, m_pad, n_pad, block,
                    interpret=False, msg_dtype="float32"):
    B = synd.shape[0]
    grid = B // block
    kernel = functools.partial(
        _bp_kernel, method=method, max_iter=max_iter, alpha_fixed=alpha_fixed,
        wr=wr, m_pad=m_pad, n_pad=n_pad, BS=block,
        msg_dtype=jnp.dtype(msg_dtype),
    )
    # plain pallas interpret (pure XLA lowering), NOT the Mosaic TPU
    # simulator: the simulator's io_callback buffer machinery deadlocks
    # under multi-device SPMD execution (shard_map on the CPU mesh)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((block, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr * m_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wr, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, n_pad), jnp.int32),
        ],
    )(synd, llr0, skip, ev, ht, mask)


def bp_decode_pallas(
    graph,
    operators,
    syndromes,
    llr0,
    *,
    bp_method: str = "minimum_sum",
    max_iter: int = 0,
    ms_scaling_factor: float = 0.625,
    block: int = 128,
    interpret: bool = False,
    skip=None,
    msg_dtype: str = "float32",
):
    """Fused-BP decode; returns ``(hard [B, n] uint8, llr [B, n] f32,
    converged [B] bool, iterations [B] int32)`` like ``bp_decode``.

    ``operators`` is the dict from :func:`build_bp_operators` — pass it
    through any enclosing jit as an argument.

    ``skip`` ([B] bool/int, optional) marks samples born "converged": their
    ``hard`` is zeros, ``llr`` is the prior, ``converged`` reads True, and
    an all-skip block exits before its first iteration — sort the batch so
    skips cluster into whole blocks (used by the staged long-``max_iter``
    pipeline, which re-decodes only prior BP failures).
    """
    method = normalize_bp_method(bp_method)
    if max_iter == 0:
        max_iter = graph.n
    m, n, wr = graph.m, graph.n, graph.wr
    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, 128)

    syndromes = jnp.asarray(syndromes)
    if syndromes.ndim == 1:
        syndromes = syndromes[None, :]
    B = syndromes.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be divisible by block {block}")

    synd_p = jnp.pad(syndromes.astype(jnp.int32), ((0, 0), (0, m_pad - m)))
    llr0 = jnp.broadcast_to(jnp.asarray(llr0, jnp.float32), (B, n))
    llr0_p = jnp.pad(llr0, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    if skip is None:
        skip_p = jnp.zeros((B, n_pad), jnp.int32)
    else:
        skip_p = jnp.broadcast_to(
            jnp.asarray(skip).astype(jnp.int32)[:, None], (B, n_pad)
        )

    dt = jnp.dtype(msg_dtype)
    args = (
        synd_p, llr0_p, skip_p,
        jnp.asarray(operators["edge_var"]).astype(dt),
        jnp.asarray(operators["h_t"]).astype(dt),
        jnp.asarray(operators["mask"]),
    )
    kwargs = dict(
        method=method, max_iter=int(max_iter),
        alpha_fixed=float(ms_scaling_factor),
        wr=wr, m_pad=m_pad, n_pad=n_pad, block=block, interpret=interpret,
        msg_dtype=str(dt),
    )
    hard, llr, conv, iters = _bp_pallas_impl(*args, **kwargs)

    return (
        hard[:, :n].astype(jnp.uint8),
        llr[:, :n],
        conv[:, 0].astype(bool),
        iters[:, 0],
    )
