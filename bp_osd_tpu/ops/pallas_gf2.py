"""Pallas TPU kernel: batched GF(2) Gauss-Jordan elimination.

The XLA formulation of the OSD elimination (``decoder/osd.py:_eliminate``)
round-trips the packed matrix ``[B, m, W]`` through HBM on every one of the
~n column steps.  This kernel keeps the entire working set resident in VMEM
for a block of samples and runs the full sequential elimination in one
program: HBM traffic drops from ``O(n * B * m * W)`` to ``O(B * m * W)``
(one load + one store).

Layout: **batch on the lane axis** — ``h [W, m_pad, BS]`` with ``BS`` a
multiple of 128 and check rows on sublanes.  Every per-step, per-sample
quantity (pivot column id, shift amount, pivot row, convergence flags) is
then a natural ``[BS]`` lane vector, reductions run over the sublane/W
axes, and the only dynamic index in the loop is a sublane-axis row read of
``perm`` — all patterns Mosaic supports.  Arithmetic is int32 (bitcast from
uint32: Mosaic lacks unsigned reductions; every reduction here is a one-hot
selection so int32 is bit-exact, and ``(x >> b) & 1`` reads bit b
identically under arithmetic shift).

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

__all__ = ["eliminate_fits", "eliminate_pallas"]


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _bytes_per_sample(graph) -> int:
    """Resident VMEM bytes per sample (matrix in + out + carries, double-
    buffered by Mosaic) — shared by the block-size loop and the fit gate."""
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    m_pad = _round_up(m, 128)
    return 4 * 2 * (2 * W * m_pad + 3 * m_pad + 3 * n + 2 * r)


def eliminate_fits(graph, budget: int = 12 * 1024 * 1024) -> bool:
    """Whether the batch-on-lanes kernel fits VMEM at its minimum block
    (128 lanes).  Lifted-product-scale codes do not; callers fall back to
    the XLA elimination or the per-sample large-code kernel."""
    return 128 * _bytes_per_sample(graph) <= budget


def _elim_kernel(perm_ref, synd_ref, skip_ref, h_ref,
                 hout_ref, sout_ref, pid_ref, prow_ref, pmask_ref,
                 *, n, m, W, r, m_pad, safe_indexing):
    """One grid step: full elimination for a block of BS samples.

    Refs (batch on lanes):
      perm_ref  [n, BS]        int32   column visit order
      synd_ref  [m_pad, BS]    int32   syndrome bits (pad rows zero)
      skip_ref  [8, BS]        int32   row 0: 1 = skip this sample entirely
      h_ref     [W, m_pad, BS] int32   packed H (bitcast from uint32)
      hout_ref  [W, m_pad, BS] int32   reduced matrix out
      sout_ref  [m_pad, BS]    int32   reduced syndrome out
      pid_ref   [r, BS]        int32   pivot column ids
      prow_ref  [r, BS]        int32   pivot row ids
      pmask_ref [n, BS]        int32   1 where sorted position made a pivot

    The column loop is a ``while_loop`` that exits as soon as every sample
    in the block holds ``r`` pivots — for a full-row-rank H that typically
    happens after ~``r + small overshoot`` of the ``n`` columns.  Skipped
    samples start with ``rr = r`` (already "done"), so a block whose
    samples all carry ``skip = 1`` exits before touching the matrix; the
    caller clusters skips into whole blocks by sorting the batch.
    """
    BS = perm_ref.shape[1]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m_pad, BS), 0)
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1, BS), 0)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (r, BS), 0)
    valid_row = row_iota < m

    h0 = h_ref[:, :, :]
    rr0 = skip_ref[:, :][0] * r  # skipped samples start "done"
    if safe_indexing:
        perm_all = perm_ref[:, :]  # [n, BS] kept live; one-hot row select
        n_iota = jax.lax.broadcasted_iota(jnp.int32, (n, BS), 0)

    def step(carry):
        if safe_indexing:
            t, h, s, used, rr, pid, prow, pmask = carry
            col = jnp.sum(jnp.where(n_iota == t, perm_all, 0), axis=0)
        else:
            t, h, s, used, rr, pid, prow = carry
            col = perm_ref[pl.ds(t, 1), :][0]  # [BS] lane vector
        w = (col >> 5)[None, None, :]  # [1,1,BS]
        b = (col & 31)[None, :]  # [1,BS]

        # pivot-column bits: one-hot word select over W, per-sample shift
        word = jnp.sum(jnp.where(word_iota == w, h, 0), axis=0)  # [m_pad, BS]
        colbits = (word >> b) & 1

        elig = (colbits == 1) & (used == 0) & valid_row
        has = jnp.any(elig, axis=0)  # [BS]
        # first eligible row = min row index over eligible sublanes
        pr = jnp.min(jnp.where(elig, row_iota, jnp.int32(2**30)), axis=0)
        has = has & (rr < r)
        pr = jnp.where(has, pr, 0)

        onehot_pr = (row_iota == pr[None, :]) & has[None, :]  # [m_pad, BS]
        piv_data = jnp.sum(
            jnp.where(onehot_pr[None, :, :], h, 0), axis=1
        )  # [W, BS]
        s_piv = jnp.sum(jnp.where(onehot_pr, s, 0), axis=0)  # [BS]

        elim = (colbits == 1) & (row_iota != pr[None, :]) & has[None, :]
        h = h ^ (elim[None, :, :].astype(jnp.int32) * piv_data[:, None, :])
        s = s ^ (elim.astype(jnp.int32) * s_piv[None, :])

        hit = (slot_iota == rr[None, :]) & has[None, :]  # [r, BS]
        pid = jnp.where(hit, col[None, :], pid)
        prow = jnp.where(hit, pr[None, :], prow)

        used = used | onehot_pr.astype(jnp.int32)
        rr = rr + has.astype(jnp.int32)
        if safe_indexing:
            pmask = jnp.where(n_iota == t, has.astype(jnp.int32)[None, :], pmask)
            return t + 1, h, s, used, rr, pid, prow, pmask
        pmask_ref[pl.ds(t, 1), :] = has.astype(jnp.int32)[None, :]
        return t + 1, h, s, used, rr, pid, prow

    def unfinished(carry):
        t, rr = carry[0], carry[4]
        return (t < n) & (jnp.min(rr) < r)

    if safe_indexing:
        init = (
            jnp.int32(0),
            h0,
            synd_ref[:, :],
            jnp.zeros((m_pad, BS), jnp.int32),
            rr0,
            jnp.zeros((r, BS), jnp.int32),
            jnp.zeros((r, BS), jnp.int32),
            jnp.zeros((n, BS), jnp.int32),
        )
        # the exit test is a cross-lane reduction + scalar sync; checking it
        # every step costs more than the steps it saves, so run CHUNK
        # columns per check (steps with t >= n or all pivots found are
        # no-ops: `has` is gated by rr < r, and column selection past n
        # matches nothing, selecting col = 0 with colbits of a used row set)
        CHUNK = 16

        def chunk(carry):
            return jax.lax.fori_loop(
                0, CHUNK, lambda _, c: step(c), carry
            )

        _, h, s, used, rr, pid, prow, pmask = jax.lax.while_loop(
            unfinished, chunk, init
        )
        pmask_ref[:, :] = pmask
    else:
        # early exit can leave later rows of pmask unwritten — pre-zero it
        pmask_ref[:, :] = jnp.zeros((n, BS), jnp.int32)
        init = (
            jnp.int32(0),
            h0,
            synd_ref[:, :],
            jnp.zeros((m_pad, BS), jnp.int32),
            rr0,
            jnp.zeros((r, BS), jnp.int32),
            jnp.zeros((r, BS), jnp.int32),
        )
        _, h, s, used, rr, pid, prow = jax.lax.while_loop(unfinished, step, init)

    hout_ref[:, :, :] = h
    sout_ref[:, :] = s
    pid_ref[:, :] = pid
    prow_ref[:, :] = prow


@functools.partial(
    jax.jit, static_argnames=("n", "m", "W", "r", "block", "safe_indexing",
                              "interpret")
)
def _eliminate_pallas_impl(h_packed_t, perm_t, synd_t, skip_t, *, n, m, W, r,
                           block, safe_indexing, interpret=False):
    B = perm_t.shape[1]
    m_pad = h_packed_t.shape[1]
    grid = B // block

    kernel = functools.partial(_elim_kernel, n=n, m=m, W=W, r=r, m_pad=m_pad,
                               safe_indexing=safe_indexing)
    # plain pallas interpret (pure XLA lowering), NOT the Mosaic TPU
    # simulator: the simulator deadlocks under multi-device SPMD (shard_map)
    hout, sout, pid, prow, pmask = pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, m_pad, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, m_pad, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W, m_pad, B), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, B), jnp.int32),
            jax.ShapeDtypeStruct((r, B), jnp.int32),
            jax.ShapeDtypeStruct((r, B), jnp.int32),
            jax.ShapeDtypeStruct((n, B), jnp.int32),
        ],
    )(perm_t, synd_t, skip_t, h_packed_t)
    return hout, sout, pid, prow, pmask


def eliminate_pallas(graph, perm, synd, *, skip=None, block: int = 256,
                     interpret: bool = False, safe_indexing: bool = True):
    """Drop-in replacement for ``decoder.osd._eliminate`` backed by Pallas.

    Returns the same 5-tuple ``(h_work [B, m, W], s_work [B, m],
    pivot_ids, pivot_rows, pivot_mask)``; internally uses the
    batch-on-lanes ``[W, m_pad, B]`` layout and converts at the boundary.

    ``skip`` ([B] bool/int, optional) marks samples whose elimination can
    be skipped entirely (e.g. BP already converged) — their five outputs
    are undefined and must be masked by the caller.  Sort the batch so
    skipped samples cluster into whole blocks to realize the saving.
    """
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    B_in = perm.shape[0]
    m_pad = _round_up(m, 128)
    # fit the block into the ~16 MiB scoped-VMEM budget: the kernel keeps
    # the packed matrix in AND out plus all carries resident per sample,
    # and Mosaic double-buffers the grid blocks
    bytes_per_sample = _bytes_per_sample(graph)
    budget = 12 * 1024 * 1024
    while block > 128 and block * bytes_per_sample > budget:
        block //= 2
    # pad the batch up to a lane-aligned block multiple (extra samples get
    # the identity column order and a zero syndrome; sliced off at the end)
    block = min(block, _round_up(B_in, 128))
    B = _round_up(B_in, block)
    if skip is None:
        skip = jnp.zeros((B_in,), jnp.int32)
    else:
        skip = jnp.asarray(skip).astype(jnp.int32)
    if B != B_in:
        perm = jnp.concatenate(
            [jnp.asarray(perm, jnp.int32),
             jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B - B_in, n))],
            axis=0,
        )
        synd = jnp.concatenate(
            [jnp.asarray(synd, jnp.int32),
             jnp.zeros((B - B_in, synd.shape[1]), jnp.int32)],
            axis=0,
        )
        # padding samples are pure skips: never eliminated, sliced off below
        skip = jnp.concatenate([skip, jnp.ones((B - B_in,), jnp.int32)])

    h_t = jnp.asarray(graph.H_packed).T  # [W, m]
    h_t = jnp.pad(h_t, ((0, 0), (0, m_pad - m)))
    h_t = jax.lax.bitcast_convert_type(h_t, jnp.int32)
    h_t = jnp.broadcast_to(h_t[:, :, None], (W, m_pad, B))
    synd_t = jnp.pad(
        jnp.asarray(synd, jnp.int32), ((0, 0), (0, m_pad - m))
    ).T  # [m_pad, B]
    perm_t = jnp.asarray(perm, jnp.int32).T  # [n, B]
    skip_t = jnp.broadcast_to(skip[None, :], (8, B))  # sublane-tile aligned

    kw = dict(n=n, m=m, W=W, r=r, block=block, safe_indexing=safe_indexing,
              interpret=interpret)
    hout, sout, pid, prow, pmask = _eliminate_pallas_impl(
        h_t, perm_t, synd_t, skip_t, **kw
    )

    h_work = jax.lax.bitcast_convert_type(
        jnp.transpose(hout, (2, 1, 0))[:B_in, :m, :], jnp.uint32
    )  # [B_in, m, W]
    s_work = sout.T[:B_in, :m]
    return (
        h_work,
        s_work,
        pid.T[:B_in],
        prow.T[:B_in],
        pmask.T[:B_in].astype(bool),
    )
