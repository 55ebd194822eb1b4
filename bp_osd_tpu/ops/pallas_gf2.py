"""Pallas TPU kernel: batched GF(2) Gauss-Jordan elimination.

The XLA formulation of the OSD elimination (``decoder/osd.py:_eliminate``)
round-trips the packed matrix ``[B, m, W]`` through HBM on every one of the
~n column steps.  This kernel keeps the entire working set resident in VMEM
for a block of samples and runs the full sequential elimination in one
program: HBM traffic drops from ``O(n * B * m * W)`` to ``O(B * m * W)``
(one load + one store).

Layout: words on the sublane axis, check rows on the lane axis —
``h [BS, W, m_pad]`` with ``m_pad`` a multiple of 128 — so the hot
per-step operations (pivot-column extract, pivot-row broadcast, masked XOR)
are pure VPU elementwise ops + small-axis reductions.

Semantics match ``_eliminate`` exactly (same pivot selection: first unused
row carrying the column); validated bit-for-bit in tests (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["eliminate_pallas"]


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _elim_kernel(perm_ref, synd_ref, h_ref,
                 hout_ref, sout_ref, pid_ref, prow_ref, pmask_ref,
                 *, n, m, W, r, m_pad):
    """One grid step: full elimination for a block of BS samples.

    Refs:
      perm_ref  [BS, n]        int32   column visit order
      synd_ref  [BS, m_pad]    int32   syndrome bits (pad rows zero)
      h_ref     [BS, W, m_pad] uint32  packed H (transposed layout, shared)
      hout_ref  [BS, W, m_pad] uint32  reduced matrix out
      sout_ref  [BS, m_pad]    int32   reduced syndrome out
      pid_ref   [BS, r]        int32   pivot column ids
      prow_ref  [BS, r]        int32   pivot row ids
      pmask_ref [BS, n]        int32   1 where sorted position made a pivot
    """
    BS = perm_ref.shape[0]

    lane_row = jax.lax.broadcasted_iota(jnp.int32, (BS, m_pad), 1)  # row ids
    word_idx = jax.lax.broadcasted_iota(jnp.int32, (BS, W, 1), 1)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (BS, r), 1)
    valid_row = lane_row < m

    h0 = h_ref[:, :, :]

    def step(t, carry):
        h, s, used, rr, pid, prow = carry
        col = perm_ref[:, t]  # [BS] int32 (dynamic index on lane axis)
        w = (col >> 5)[:, None, None]  # [BS,1,1]
        b = (col & 31).astype(jnp.uint32)[:, None]  # [BS,1]

        # pivot-column bits: select word w (reduce over the small W axis),
        # then per-sample variable shift
        word = jnp.sum(
            jnp.where(word_idx == w, h, jnp.uint32(0)), axis=1
        )  # [BS, m_pad]
        colbits = ((word >> b) & 1).astype(jnp.int32)

        elig = (colbits == 1) & (used == 0) & valid_row
        has = jnp.any(elig, axis=1)  # [BS]
        # first eligible row = min row index over eligible lanes
        pr = jnp.min(
            jnp.where(elig, lane_row, jnp.int32(2**30)), axis=1
        )  # [BS]
        has = has & (rr < r)
        pr = jnp.where(has, pr, 0)

        onehot_pr = (lane_row == pr[:, None]) & has[:, None]  # [BS, m_pad]
        # pivot row contents: reduce over lanes -> [BS, W]
        piv_data = jnp.sum(
            jnp.where(onehot_pr[:, None, :], h, jnp.uint32(0)), axis=2
        )
        s_piv = jnp.sum(jnp.where(onehot_pr, s, 0), axis=1)  # [BS]

        elim = (colbits == 1) & (lane_row != pr[:, None]) & has[:, None]
        h = h ^ (elim[:, None, :].astype(jnp.uint32) * piv_data[:, :, None])
        s = s ^ (elim.astype(jnp.int32) * s_piv[:, None])

        hit = (slot_idx == rr[:, None]) & has[:, None]  # [BS, r]
        pid = jnp.where(hit, col[:, None], pid)
        prow = jnp.where(hit, pr[:, None], prow)
        pmask_ref[:, pl.ds(t, 1)] = has.astype(jnp.int32)[:, None]

        used = used | onehot_pr.astype(jnp.int32)
        rr = rr + has.astype(jnp.int32)
        return h, s, used, rr, pid, prow

    init = (
        h0,
        synd_ref[:, :],
        jnp.zeros((BS, m_pad), jnp.int32),
        jnp.zeros((BS,), jnp.int32),
        jnp.zeros((BS, r), jnp.int32),
        jnp.zeros((BS, r), jnp.int32),
    )
    h, s, used, rr, pid, prow = jax.lax.fori_loop(0, n, step, init)

    hout_ref[:, :, :] = h
    sout_ref[:, :] = s
    pid_ref[:, :] = pid
    prow_ref[:, :] = prow


@functools.partial(jax.jit, static_argnames=("n", "m", "W", "r", "block"))
def _eliminate_pallas_impl(h_packed_t, perm, synd, *, n, m, W, r, block):
    B = perm.shape[0]
    m_pad = h_packed_t.shape[-1]
    grid = B // block

    kernel = functools.partial(
        _elim_kernel, n=n, m=m, W=W, r=r, m_pad=m_pad
    )
    hout, sout, pid, prow, pmask = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, W, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, W, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, W, m_pad), jnp.uint32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, r), jnp.int32),
            jax.ShapeDtypeStruct((B, r), jnp.int32),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
        ],
    )(perm, synd, h_packed_t)
    return hout, sout, pid, prow, pmask


def eliminate_pallas(graph, perm, synd, *, block: int = 256, interpret: bool = False):
    """Drop-in replacement for ``decoder.osd._eliminate`` backed by Pallas.

    Returns the same 5-tuple ``(h_work [B, m, W], s_work [B, m],
    pivot_ids, pivot_rows, pivot_mask)``; internally uses the transposed
    ``[B, W, m_pad]`` layout and converts at the boundary.
    """
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    B = perm.shape[0]
    m_pad = _round_up(m, 128)
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be divisible by block {block}")

    h_t = jnp.asarray(graph.H_packed).T  # [W, m]
    h_t = jnp.pad(h_t, ((0, 0), (0, m_pad - m)))
    h_t = jnp.broadcast_to(h_t[None], (B, W, m_pad))
    synd_p = jnp.pad(jnp.asarray(synd, jnp.int32), ((0, 0), (0, m_pad - m)))
    perm = jnp.asarray(perm, jnp.int32)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            hout, sout, pid, prow, pmask = _eliminate_pallas_impl(
                h_t, perm, synd_p, n=n, m=m, W=W, r=r, block=block
            )
    else:
        hout, sout, pid, prow, pmask = _eliminate_pallas_impl(
            h_t, perm, synd_p, n=n, m=m, W=W, r=r, block=block
        )

    h_work = jnp.swapaxes(hout, 1, 2)[:, :m, :]  # [B, m, W]
    s_work = sout[:, :m]
    return h_work, s_work, pid, prow, pmask.astype(bool)
