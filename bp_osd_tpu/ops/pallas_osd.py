"""Pallas TPU kernel: fully fused OSD combination-sweep decode.

``pallas_gf2.eliminate_pallas`` keeps the Gauss-Jordan elimination VMEM-
resident but still hands the reduced matrix back to XLA, which then
materializes the dense reduced T-columns ``[B, r, k]`` in f32 for the
candidate search — ~0.65 GB of HBM traffic per 4096-sample dispatch, the
dominant OSD cost.  This kernel fuses the ENTIRE osd_cs pipeline
(reference ``README.md:185-187``: osd0 + combination sweep of
arXiv:2005.07016) into one program that never leaves VMEM:

1. Gauss-Jordan elimination of H in per-sample reliability order
   (identical semantics to ``decoder/osd.py:_eliminate``), additionally
   recording the first ``lam`` T-column ids per sample and a bit-packed
   pivot-column mask.
2. Weight-1 sweep over ALL T columns: after full elimination the unused
   rows are exactly zero, so the weight of candidate "flip T-column c" is
   ``popcount(s_reduced XOR col_c)`` over raw rows — no pivot-row
   compaction needed.  Columns are visited in raw packed order (static
   word index = zero-cost row reads) and ties resolve through a composite
   key ``weight * BASE + candidate_rank`` where the rank reproduces the
   reference candidate order: zero pattern first, then weight-1 by
   reliability (via the inverse permutation), then weight-2 pairs in
   lexicographic order.
3. Weight-2 sweep over all pairs of the first ``lam`` T columns, whose
   reduced-column bits were bit-packed into a ``[ceil(lam/32), m_pad, BS]``
   VMEM buffer during the weight-1 sweep.
4. Winner reconstruction: residual syndrome ``s XOR col_t1 XOR col_t2``
   plus the winning T-column ids; the caller assembles the error vector
   with two O(B*r) gathers.

Outputs (vs ``eliminate_pallas``): the reduced matrix is NOT written back
to HBM at all — only the reduced syndrome, pivot ids/rows, best residual
and winner ids leave the chip.

Layout and Mosaic idioms follow ``pallas_gf2.py``: batch on lanes, check
rows on sublanes, int32 bitcast arithmetic, one-hot iota selections
instead of dynamic minor-axis indexing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["osd_cs_pallas"]

# python int: a module-level jnp scalar would become a captured constant
# inside the kernel trace, which pallas_call rejects
_BIGKEY = 1 << 28


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _osd_cs_kernel(perm_ref, ppos_ref, synd_ref, skip_ref, h_ref,
                   sout_ref, pid_ref, prow_ref, sbest_ref, tbest_ref,
                   *, n, m, W, r, m_pad, lam, lam_pad, lamw):
    """One grid step: full eliminate + osd_cs search for BS samples.

    Refs (batch on lanes):
      perm_ref  [n, BS]        int32  column visit order (reliability)
      ppos_ref  [32, W, BS]    int32  perm position of column 32w+b
      synd_ref  [m_pad, BS]    int32  syndrome bits
      skip_ref  [8, BS]        int32  row 0: 1 = skip sample
      h_ref     [W, m_pad, 1]  int32  packed H (bitcast from uint32);
                                      ONE copy, lane-broadcast in-kernel —
                                      per-sample copies diverge only after
                                      elimination starts, so materializing
                                      [W, m_pad, B] in HBM (~54 MB per
                                      4096-batch) would be pure waste
      sout_ref  [m_pad, BS]    int32  reduced syndrome
      pid_ref   [r, BS]        int32  pivot column ids
      prow_ref  [r, BS]        int32  pivot row ids
      sbest_ref [m_pad, BS]    int32  reduced syndrome ^ winning T columns
      tbest_ref [8, BS]        int32  rows 0/1: winning T ids (-1 = none)
    """
    BS = perm_ref.shape[1]
    BASE = jnp.int32(4096)  # > n + lam*lam + 2: max candidate rank

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m_pad, BS), 0)
    word_iota3 = jax.lax.broadcasted_iota(jnp.int32, (W, 1, BS), 0)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (r, BS), 0)
    lam_iota = jax.lax.broadcasted_iota(jnp.int32, (lam_pad, BS), 0)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (n, BS), 0)
    iota32 = jax.lax.broadcasted_iota(jnp.int32, (32, BS), 0)
    valid_row = row_iota < m

    h0 = jnp.broadcast_to(h_ref[:, :, :], (W, m_pad, BS))
    s0 = synd_ref[:, :]
    skiprow = skip_ref[:, :][0]  # [BS]
    rr0 = skiprow * r
    tt0 = skiprow * lam
    perm_all = perm_ref[:, :]
    live = jnp.min(skiprow) == 0  # any sample in the block does real work

    # ---- phase 1: elimination + T-id collection + packed pivot mask ----
    def step(carry):
        t, h, s, used, rr, tt, pid, prow, tcid, pivw = carry
        col = jnp.sum(jnp.where(n_iota == t, perm_all, 0), axis=0)  # [BS]
        w = (col >> 5)[None, None, :]  # [1,1,BS]
        b = (col & 31)[None, :]  # [1,BS]

        word = jnp.sum(jnp.where(word_iota3 == w, h, 0), axis=0)  # [m_pad,BS]
        colbits = (word >> b) & 1

        elig = (colbits == 1) & (used == 0) & valid_row
        has = jnp.any(elig, axis=0) & (rr < r)  # [BS]
        pr = jnp.min(jnp.where(elig, row_iota, jnp.int32(2**30)), axis=0)
        pr = jnp.where(has, pr, 0)

        onehot_pr = (row_iota == pr[None, :]) & has[None, :]
        piv_data = jnp.sum(jnp.where(onehot_pr[None, :, :], h, 0), axis=1)
        s_piv = jnp.sum(jnp.where(onehot_pr, s, 0), axis=0)

        elim = (colbits == 1) & (row_iota != pr[None, :]) & has[None, :]
        h = h ^ (elim[None, :, :].astype(jnp.int32) * piv_data[:, None, :])
        s = s ^ (elim.astype(jnp.int32) * s_piv[None, :])

        hit = (slot_iota == rr[None, :]) & has[None, :]
        pid = jnp.where(hit, col[None, :], pid)
        prow = jnp.where(hit, pr[None, :], prow)
        used = used | onehot_pr.astype(jnp.int32)

        # packed pivot-column mask: set bit b of word w where a pivot fell
        pivbit = (has.astype(jnp.int32) << b)[None]  # [1,1,BS]
        pivw = pivw | jnp.where(word_iota3 == w, pivbit, 0)

        # record the first `lam` T columns: every visited column that did
        # not produce a pivot is T (including post-rank-complete columns).
        # The `t < n` guard keeps CHUNK-overrun steps (which read column 0)
        # from being recorded as T columns when CHUNK does not divide n.
        is_t = ~has
        rec = is_t & (tt < lam) & (skiprow == 0) & (t < n)
        hit_t = (lam_iota == tt[None, :]) & rec[None, :]
        tcid = jnp.where(hit_t, col[None, :], tcid)
        tt = tt + rec.astype(jnp.int32)
        rr = rr + has.astype(jnp.int32)
        return t + 1, h, s, used, rr, tt, pid, prow, tcid, pivw

    def unfinished(carry):
        t, rr, tt = carry[0], carry[4], carry[5]
        return (t < n) & ((jnp.min(rr) < r) | (jnp.min(tt) < lam))

    CHUNK = 16

    def chunk(carry):
        return jax.lax.fori_loop(0, CHUNK, lambda _, c: step(c), carry)

    init = (
        jnp.int32(0),
        h0,
        s0,
        jnp.zeros((m_pad, BS), jnp.int32),
        rr0,
        tt0,
        jnp.zeros((r, BS), jnp.int32),
        jnp.zeros((r, BS), jnp.int32),
        jnp.zeros((lam_pad, BS), jnp.int32),
        jnp.zeros((W, 1, BS), jnp.int32),
    )
    _, h, s, used, rr, tt, pid, prow, tcid, pivw = jax.lax.while_loop(
        unfinished, chunk, init
    )

    # ---- phase 2: weight-1 sweep over all columns (raw packed order) ----
    w0 = jnp.sum(s, axis=0)  # [BS] weight of the zero candidate
    best_key0 = w0 * BASE  # rank 0
    bt1_0 = jnp.zeros((BS,), jnp.int32) - 1
    bt2_0 = jnp.zeros((BS,), jnp.int32) - 1
    # packed reduced-column bits of the first `lam` T columns, one
    # [m_pad, BS] word-plane per 32 slots (tuple: avoids stacked-axis
    # indexing inside the Mosaic loop)
    buf0 = tuple(jnp.zeros((m_pad, BS), jnp.int32) for _ in range(lamw))

    # Every bit position is a compile-time constant: the shifts below are
    # static, and the whole sweep is straight-line vector code (the
    # previous per-bit while_loop paid ~416 sequential Mosaic loop
    # iterations per block — loop overhead dominated the actual work).
    # ``lax.cond(live, ...)`` keeps all-skip blocks on the cheap branch.
    def w1_all(carry):
        best_key, bt1, bt2, buf = carry
        buf = list(buf)
        for c in range(n):
            wi, bit = c >> 5, c & 31
            hw = h[wi]
            colbits = (hw >> bit) & 1  # [m_pad, BS]
            is_piv = (pivw[wi][0] >> bit) & 1  # [BS]
            wgt = jnp.sum(colbits ^ s, axis=0) + 1
            ppos_c = ppos_ref[bit, wi, :]  # [BS] static read
            key = wgt * BASE + 1 + ppos_c + _BIGKEY * is_piv
            better = key < best_key
            best_key = jnp.where(better, key, best_key)
            bt1 = jnp.where(better, c, bt1)
            bt2 = jnp.where(better, jnp.int32(-1), bt2)

            # pack this column's bits into the first-lam buffer
            match = tcid == c  # [lam_pad, BS]
            found = jnp.any(match, axis=0)  # [BS]
            slot = jnp.sum(
                jnp.where(match, lam_iota, 0), axis=0
            )  # [BS], 0 when absent
            for lw in range(lamw):
                in_lw = (found & ((slot >> 5) == lw)).astype(jnp.int32)
                shift = (slot & 31)[None, :]
                buf[lw] = buf[lw] | ((colbits * in_lw[None, :]) << shift)
        return best_key, bt1, bt2, tuple(buf)

    carry = (best_key0, bt1_0, bt2_0, buf0)
    best_key, bt1, bt2, buf = jax.lax.cond(
        live, w1_all, lambda c: c, carry
    )

    # ---- phase 3: weight-2 sweep over pairs of the first lam T columns --
    # Outer loop over ``a`` stays a (live-gated) while_loop; the inner
    # ``b`` loop is statically unrolled so every unpack shift is a
    # compile-time constant and the ~lam^2/2 sequential Mosaic loop
    # iterations per block (pure loop overhead) collapse to lam-1.
    if lam >= 2:
        def unpack(idx):
            """Bits of T-slot ``idx`` (traced scalar) from the packed buf."""
            sel = jnp.zeros((m_pad, BS), jnp.int32)
            for lw in range(lamw):
                sel = sel | jnp.where((idx >> 5) == lw, buf[lw], 0)
            return (sel >> (idx & 31)) & 1

        def tcid_at(idx):
            return jnp.sum(jnp.where(lam_iota == idx, tcid, 0), axis=0)

        def pair_outer(st):
            a, best_key, bt1, bt2 = st
            xa = s ^ unpack(a)
            t1a = tcid_at(a)
            for b in range(1, lam):
                colb = (buf[b >> 5] >> (b & 31)) & 1  # static shift
                wgt = jnp.sum(xa ^ colb, axis=0) + 2
                rank = jnp.int32(n + 1) + a * lam + b
                # pairs require b > a: demote b <= a out of contention
                key = wgt * BASE + rank + _BIGKEY * (a >= b)
                better = key < best_key
                best_key = jnp.where(better, key, best_key)
                bt1 = jnp.where(better, t1a, bt1)
                bt2 = jnp.where(better, tcid[b], bt2)
            return a + 1, best_key, bt1, bt2

        _, best_key, bt1, bt2 = jax.lax.while_loop(
            lambda st: (st[0] < lam - 1) & live,
            pair_outer,
            (jnp.int32(0), best_key, bt1, bt2),
        )

    # ---- phase 4: winner residual ---------------------------------------
    def colbits_of(tid):
        """[m_pad, BS] bits of original-id column ``tid`` ([BS]); 0 if -1."""
        w = (tid >> 5)[None, None, :]
        b = (tid & 31)[None, :]
        word = jnp.sum(jnp.where(word_iota3 == w, h, 0), axis=0)
        bits = (word >> b) & 1
        return bits * (tid >= 0)[None, :].astype(jnp.int32)

    sbest = s ^ colbits_of(bt1) ^ colbits_of(bt2)

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, BS), 0)
    tbest = jnp.where(iota8 == 0, bt1[None, :],
                      jnp.where(iota8 == 1, bt2[None, :], 0))

    sout_ref[:, :] = s
    pid_ref[:, :] = pid
    prow_ref[:, :] = prow
    sbest_ref[:, :] = sbest
    tbest_ref[:, :] = tbest


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "W", "r", "lam", "lam_pad", "lamw", "block",
                     "interpret"),
)
def _osd_cs_impl(h_t, perm_t, ppos_t, synd_t, skip_t,
                 *, n, m, W, r, lam, lam_pad, lamw, block, interpret=False):
    B = perm_t.shape[1]
    m_pad = h_t.shape[1]
    grid = B // block
    kernel = functools.partial(
        _osd_cs_kernel, n=n, m=m, W=W, r=r, m_pad=m_pad,
        lam=lam, lam_pad=lam_pad, lamw=lamw,
    )
    sout, pid, prow, sbest, tbest = pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, W, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, m_pad, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, B), jnp.int32),
            jax.ShapeDtypeStruct((r, B), jnp.int32),
            jax.ShapeDtypeStruct((r, B), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
        ],
    )(perm_t, ppos_t, synd_t, skip_t, h_t)
    return sout, pid, prow, sbest, tbest


def osd_cs_pallas(graph, perm, synd, *, osd_order: int, skip=None,
                  block: int = 256, interpret: bool = False):
    """Fused osd_cs decode on a reliability permutation.

    Args:
      graph: TannerGraph.
      perm:  [B, n] int32 reliability column order (stable argsort of LLRs).
      synd:  [B, m] syndrome bits.
      osd_order: combination-sweep depth (weight-2 over the first
        ``min(osd_order, k)`` T columns).
      skip:  [B] optional bool/int; marked samples are bypassed (outputs
        undefined, caller masks).  Cluster skips for whole-block savings.

    Returns ``(e0 [B, n] int32, e_w [B, n] int32)``: the osd0 and osdw
    error vectors (undefined rows where ``skip``).
    """
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    k = n - r
    lam = max(int(min(osd_order, k)), 0)
    lam_pad = max(_round_up(max(lam, 1), 8), 8)
    lamw = max(-(-lam // 32), 1)
    B_in = perm.shape[0]
    m_pad = _round_up(m, 128)

    # VMEM budget: in/out blocks are double-buffered by Mosaic; H enters as
    # a single shared [W, m_pad, 1] block, so only the carried per-sample
    # copy scales with the block size
    bytes_per_sample = 4 * (
        W * m_pad              # carried eliminated copy of H
        + 2 * lamw * m_pad     # packed first-lam buffer
        + 10 * m_pad           # s, used, sout, sbest + slack
        + 3 * n                # perm, n_iota workspace
        + 32 * W               # ppos
        + 4 * r + 2 * lam_pad
    )
    # measured on v5e: the straight-line weight-1 sweep + lax.cond carries
    # push peak scoped-vmem to ~20 MB at block=256 (limit 16 MB); 9 MB here
    # steers the halving loop to block=128 for flagship-sized codes
    budget = 9 * 1024 * 1024
    while block > 128 and block * bytes_per_sample > budget:
        block //= 2
    block = min(block, _round_up(B_in, 128))
    B = _round_up(B_in, block)

    perm = jnp.asarray(perm, jnp.int32)
    synd = jnp.asarray(synd, jnp.int32)
    if skip is None:
        skip = jnp.zeros((B_in,), jnp.int32)
    else:
        skip = jnp.asarray(skip).astype(jnp.int32)
    if B != B_in:
        perm = jnp.concatenate(
            [perm, jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                    (B - B_in, n))], axis=0)
        synd = jnp.concatenate(
            [synd, jnp.zeros((B - B_in, synd.shape[1]), jnp.int32)], axis=0)
        skip = jnp.concatenate([skip, jnp.ones((B - B_in,), jnp.int32)])

    # inverse permutation by scatter: ppos[b, c] = position of column c in
    # perm[b] (perm rows are permutations, so the scatter is collision-free
    # and O(B*n) — cheaper than a second row-wise sort network)
    ppos = (
        jnp.zeros((B, n), jnp.int32)
        .at[jnp.arange(B, dtype=jnp.int32)[:, None], perm]
        .set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n)))
    )
    ppos_p = jnp.pad(ppos, ((0, 0), (0, 32 * W - n)))
    ppos_t = jnp.transpose(
        ppos_p.reshape(B, W, 32), (2, 1, 0)
    )  # [32, W, B]

    h_t = jnp.asarray(graph.H_packed).T  # [W, m]
    h_t = jnp.pad(h_t, ((0, 0), (0, m_pad - m)))
    h_t = jax.lax.bitcast_convert_type(h_t, jnp.int32)[:, :, None]  # [W,m_pad,1]
    synd_t = jnp.pad(synd, ((0, 0), (0, m_pad - m))).T
    perm_t = perm.T
    skip_t = jnp.broadcast_to(skip[None, :], (8, B))

    kw = dict(n=n, m=m, W=W, r=r, lam=lam, lam_pad=lam_pad, lamw=lamw,
              block=block, interpret=interpret)
    sout, pid, prow, sbest, tbest = _osd_cs_impl(
        h_t, perm_t, ppos_t, synd_t, skip_t, **kw)

    sout = sout.T[:B_in, :m]
    sbest = sbest.T[:B_in, :m]
    pid = pid.T[:B_in]
    prow = prow.T[:B_in]
    t1 = tbest[0, :B_in]
    t2 = tbest[1, :B_in]

    bidx = jnp.arange(B_in)[:, None]
    s_rows = jnp.take_along_axis(sout, prow, axis=1)  # [B, r]
    e0 = jnp.zeros((B_in, n), jnp.int32).at[bidx, pid].set(s_rows)

    sb_rows = jnp.take_along_axis(sbest, prow, axis=1)
    e_w = jnp.zeros((B_in, n), jnp.int32).at[bidx, pid].set(sb_rows)
    bvec = jnp.arange(B_in)
    e_w = e_w.at[bvec, jnp.clip(t1, 0, n - 1)].add((t1 >= 0).astype(jnp.int32))
    e_w = e_w.at[bvec, jnp.clip(t2, 0, n - 1)].add((t2 >= 0).astype(jnp.int32))
    return e0, e_w
