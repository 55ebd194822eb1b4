"""Pallas TPU kernel: fully fused OSD combination-sweep decode.

Fuses the ENTIRE osd_cs pipeline (reference ``README.md:185-187``: osd0 +
combination sweep of arXiv:2005.07016) into one VMEM-resident program.

Round-3 redesign (pre-permuted static column order):

The round-2 kernel eliminated columns in per-sample reliability order read
from a ``perm`` input.  Every step then needed a one-hot select over the
word axis of the packed matrix (``[W, m_pad, BS]`` select-sum) plus a
per-sample VECTOR shift to extract the pivot column — together ~10x the
cost of the irreducible XOR volume.  Here an XLA pre-pass builds, per
sample, the packed matrix with columns ALREADY in reliability order:

1. ``_permuted_packed_h``: Hp[b][:, c'] = H[:, perm[b, c']], bit-packed
   along the permuted column axis.  Built exactly with byte-split f32
   matmuls (one-hot scatter weights <= 128, sums <= 2^24 — MXU work, exact
   in f32), chunked over the batch to bound memory.
2. The elimination then visits columns 0..n-1: the word index is a
   *scalar* ``t >> 5`` (a dynamic leading-axis ref read, resolved by
   addressing hardware, not VPU selects) and the bit shift ``t & 31`` is a
   scalar-uniform shift.  The packed matrix lives in a mutable VMEM
   scratch ref.
3. Candidate ranks simplify: the reliability position of permuted column
   ``c'`` IS ``c'``, so the ``ppos`` inverse-permutation input of round 2
   disappears while the tie-break key stays bit-identical
   (``weight * BASE + rank``, zero pattern first, weight-1 by reliability,
   weight-2 pairs lexicographic).
4. The kernel emits the osd0/osdw error vectors directly in permuted
   coordinates (pivot values via column-dot-syndrome: a fully reduced
   pivot column is a unit vector at its pivot row, so
   ``e[c'] = <col_c', s_reduced>`` masked by the pivot bitmask).  The
   caller scatters them back through ``perm`` — no pivot id/row outputs
   or host-side gathers needed.

Layout: batch on lanes, check rows on sublanes, int32 bitcast arithmetic.
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
_PREPASS_CHUNK = 512


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _permuted_packed_h(graph, perm, W, m_pad):
    """Per-sample column-permuted, bit-packed H: returns [B, W, m_pad] int32.

    ``out[b, w, i]`` bit ``v`` = ``H[i, perm[b, 32w+v]]``.  Exact f32
    matmul construction: column c lands at permuted position p = ppos[b,c];
    a weighted one-hot M8[b, c, p>>3] = 1 << (p & 7) contracts against H^T
    over c, giving the packed BYTES (values <= 8*128, exact in f32), which
    are then combined into int32 words.

    H^T is unpacked from ``graph.H_packed`` (a pytree leaf, available
    inside jit; ``graph.H`` is host-only and absent after tree_unflatten).
    """
    n = perm.shape[1]
    m = graph.m
    B = perm.shape[0]
    K4 = 4 * W
    hp = jax.lax.bitcast_convert_type(
        jnp.asarray(graph.H_packed), jnp.int32
    )  # [m, W]
    bits = (hp[:, :, None] >> jnp.arange(32, dtype=jnp.int32)) & 1
    Hd = bits.reshape(m, W * 32)[:, :n]  # [m, n]
    Ht = jnp.zeros((n, m_pad), jnp.float32).at[:, :m].set(
        Hd.astype(jnp.float32).T
    )
    k_iota = jnp.arange(K4, dtype=jnp.int32)
    nchunk = (
        B // _PREPASS_CHUNK
        if B % _PREPASS_CHUNK == 0 and B >= _PREPASS_CHUNK
        else 1
    )
    csize = B // nchunk
    bidx = jnp.arange(csize, dtype=jnp.int32)[:, None]
    cols = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (csize, n))

    def chunk_fn(perm_c):  # [C, n] -> [C, W, m_pad] int32
        ppos = (
            jnp.zeros((csize, n), jnp.int32).at[bidx, perm_c].set(cols)
        )
        key = ppos >> 3
        val = (1 << (ppos & 7)).astype(jnp.float32)
        M8 = (key[:, :, None] == k_iota[None, None, :]) * val[:, :, None]
        bytes_f = jnp.einsum(
            "bck,ci->bki", M8, Ht, preferred_element_type=jnp.float32
        )  # [C, K4, m_pad]
        bytes_i = bytes_f.astype(jnp.int32).reshape(csize, W, 4, m_pad)
        word = (
            bytes_i[:, :, 0]
            | (bytes_i[:, :, 1] << 8)
            | (bytes_i[:, :, 2] << 16)
            | (bytes_i[:, :, 3] << 24)
        )
        return word

    if nchunk == 1:
        return chunk_fn(perm)
    out = jax.lax.map(chunk_fn, perm.reshape(nchunk, csize, n))
    return out.reshape(B, W, m_pad)


def _osd_cs_kernel(synd_ref, skip_ref, h0_ref,
                   e0_ref, ew_ref,
                   h_scr, pivw_scr,
                   *, n, m, W, r, m_pad, n_sub, lam, lam_pad, lamw):
    """One grid step: full eliminate + osd_cs search for BS samples.

    Refs (batch on lanes):
      synd_ref  [m_pad, BS]     int32  syndrome bits
      skip_ref  [8, BS]         int32  row 0: 1 = skip sample
      h0_ref    [W, m_pad, BS]  int32  per-sample permuted packed H
      e0_ref    [n_sub, BS]     int32  osd0 error vector (permuted coords)
      ew_ref    [n_sub, BS]     int32  osdw error vector (permuted coords)
      h_scr     [W, m_pad, BS]  int32  scratch: reduced matrix (in place)
      pivw_scr  [W, 8, BS]      int32  scratch: pivot-column bitmask (row 0)
    """
    BS = synd_ref.shape[1]
    BASE = jnp.int32(4096)  # > n + lam*lam + 2: max candidate rank
    e0_ref[:, :] = jnp.zeros((n_sub, BS), jnp.int32)
    ew_ref[:, :] = jnp.zeros((n_sub, BS), jnp.int32)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m_pad, BS), 0)
    lam_iota = jax.lax.broadcasted_iota(jnp.int32, (lam_pad, BS), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, BS), 0)
    valid_row = row_iota < m

    h_scr[:, :, :] = h0_ref[:, :, :]
    pivw_scr[:, :, :] = jnp.zeros((W, 8, BS), jnp.int32)

    s0 = synd_ref[:, :]
    skiprow = skip_ref[0, :]  # [BS]
    rr0 = skiprow * r
    tt0 = skiprow * lam
    live = jnp.min(skiprow) == 0  # any sample in the block does real work

    # ---- phase 1: elimination + T-id collection + packed pivot mask ----
    def step(carry):
        t, s, used, rr, tt, tcid = carry
        w = t >> 5
        b = t & 31
        cw = h_scr[w]  # [m_pad, BS] dynamic leading-axis read
        colbits = (cw >> b) & 1

        elig = (colbits == 1) & (used == 0) & valid_row
        has = jnp.any(elig, axis=0) & (rr < r)  # [BS]
        pr = jnp.min(jnp.where(elig, row_iota, jnp.int32(2**30)), axis=0)
        pr = jnp.where(has, pr, 0)

        onehot = (row_iota == pr[None, :]) & has[None, :]
        ohm = -onehot.astype(jnp.int32)  # all-ones where pivot row
        s_piv = jnp.sum(jnp.where(onehot, s, 0), axis=0)  # [BS]
        elimm = -((colbits == 1) & ~onehot & has[None, :]).astype(jnp.int32)

        # Jordan step over every word: extraction and update are plain
        # AND/XOR passes (no integer multiplies, no word selects)
        for w2 in range(W):
            hw = h_scr[w2]
            piv = jnp.sum(hw & ohm, axis=0)  # [BS] pivot-row word
            h_scr[w2] = hw ^ (elimm & piv[None, :])
        s = s ^ (elimm & s_piv[None, :])

        # pivot-column bitmask: set bit b of word w where a pivot fell
        pv = pivw_scr[w]
        pivw_scr[w] = pv | jnp.where(
            iota8 == 0, (has.astype(jnp.int32) << b)[None, :], 0
        )

        # record the first `lam` T columns (permuted ids): every visited
        # column that did not produce a pivot is T, including
        # post-rank-complete columns.  `t < n` guards CHUNK overrun.
        rec = ~has & (tt < lam) & (skiprow == 0) & (t < n)
        hit_t = (lam_iota == tt[None, :]) & rec[None, :]
        tcid = jnp.where(hit_t, t, tcid)
        tt = tt + rec.astype(jnp.int32)
        rr = rr + has.astype(jnp.int32)
        used = used | onehot.astype(jnp.int32)
        return t + 1, s, used, rr, tt, tcid

    def unfinished(carry):
        t, rr, tt = carry[0], carry[3], carry[4]
        return (t < n) & ((jnp.min(rr) < r) | (jnp.min(tt) < lam))

    CHUNK = 16

    def chunk(carry):
        return jax.lax.fori_loop(0, CHUNK, lambda _, c: step(c), carry)

    init = (
        jnp.int32(0),
        s0,
        jnp.zeros((m_pad, BS), jnp.int32),
        rr0,
        tt0,
        jnp.zeros((lam_pad, BS), jnp.int32),
    )
    _, s, used, rr, tt, tcid = jax.lax.while_loop(unfinished, chunk, init)

    # ---- phase 2: weight-1 sweep over all columns (reliability order) ----
    w0 = jnp.sum(s, axis=0)  # [BS] weight of the zero candidate
    best_key0 = w0 * BASE  # rank 0
    bt1_0 = jnp.zeros((BS,), jnp.int32) - 1
    bt2_0 = jnp.zeros((BS,), jnp.int32) - 1
    # packed reduced-column bits of the first `lam` T columns, one
    # [m_pad, BS] word-plane per 32 slots (tuple: avoids stacked-axis
    # indexing inside the Mosaic loop)
    buf0 = tuple(jnp.zeros((m_pad, BS), jnp.int32) for _ in range(lamw))

    # Every bit position is a compile-time constant: the shifts below are
    # static and the whole sweep is straight-line vector code.
    # ``lax.cond(live, ...)`` keeps all-skip blocks on the cheap branch
    # (pure values only — ref writes happen under ``pl.when`` in phase 4).
    def w1_all(carry):
        best_key, bt1, bt2, buf = carry
        buf = list(buf)
        for c in range(n):
            wi, bit = c >> 5, c & 31
            hw = h_scr[wi]
            colbits = (hw >> bit) & 1  # [m_pad, BS]
            is_piv = (pivw_scr[wi][0] >> bit) & 1  # [BS]
            wgt = jnp.sum(colbits ^ s, axis=0) + 1
            key = wgt * BASE + 1 + c + _BIGKEY * is_piv
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
    best_key, bt1, bt2, buf = jax.lax.cond(live, w1_all, lambda c: c, carry)

    # ---- phase 3: weight-2 sweep over pairs of the first lam T columns --
    # Outer loop over ``a`` stays a (live-gated) while_loop; the inner
    # ``b`` loop is statically unrolled so every unpack shift is a
    # compile-time constant.
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

    # ---- phase 4: winner residual + osd0/osdw vectors ------------------
    # e[c'] = <col_c', s> masked by the pivot bit (a reduced pivot column
    # is a unit vector at its pivot row, so the dot reads the solution off
    # the reduced syndrome); winner T bits are added on top for osdw.
    @pl.when(live)
    def _emit():
        def colbits_of(tid):
            """[m_pad, BS] bits of permuted column ``tid`` ([BS]); 0 if -1."""
            tw = tid >> 5
            acc = jnp.zeros((m_pad, BS), jnp.int32)
            for w2 in range(W):
                acc = acc | jnp.where(tw[None, :] == w2, h_scr[w2], 0)
            bits = (acc >> (tid & 31)[None, :]) & 1
            return bits & (tid >= 0)[None, :].astype(jnp.int32)

        sbest = s ^ colbits_of(bt1) ^ colbits_of(bt2)
        for c in range(n):
            wi, bit = c >> 5, c & 31
            colbits = (h_scr[wi] >> bit) & 1
            is_piv = -((pivw_scr[wi][0] >> bit) & 1)  # 0 or all-ones
            e0_ref[c, :] = jnp.sum(colbits & s, axis=0) & is_piv
            ew = jnp.sum(colbits & sbest, axis=0) & is_piv
            ew_ref[c, :] = ew + (bt1 == c) + (bt2 == c)


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "W", "r", "lam", "lam_pad", "lamw", "block",
                     "interpret"),
)
def _osd_cs_impl(h_t, synd_t, skip_t,
                 *, n, m, W, r, lam, lam_pad, lamw, block, interpret=False):
    B = synd_t.shape[1]
    m_pad = h_t.shape[1]
    grid = B // block
    n_sub = _round_up(n, 8)
    kernel = functools.partial(
        _osd_cs_kernel, n=n, m=m, W=W, r=r, m_pad=m_pad, n_sub=n_sub,
        lam=lam, lam_pad=lam_pad, lamw=lamw,
    )
    e0, ew = pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((m_pad, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, m_pad, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_sub, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sub, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_sub, B), jnp.int32),
            jax.ShapeDtypeStruct((n_sub, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, m_pad, block), jnp.int32),
            pltpu.VMEM((W, 8, block), jnp.int32),
        ],
    )(synd_t, skip_t, h_t)
    return e0, ew


def osd_cs_pallas(graph, perm, synd, *, osd_order: int, skip=None,
                  block: int = 128, interpret: bool = False):
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
    if n + 2 + osd_order * osd_order >= 4096:
        raise ValueError("fused osd_cs tie-break key space exceeded")
    k = n - r
    lam = max(int(min(osd_order, k)), 0)
    lam_pad = max(_round_up(max(lam, 1), 8), 8)
    lamw = max(-(-lam // 32), 1)
    B_in = perm.shape[0]
    m_pad = _round_up(m, 128)

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

    hp = _permuted_packed_h(graph, perm, W, m_pad)  # [B, W, m_pad]
    h_t = jnp.transpose(hp, (1, 2, 0))  # [W, m_pad, B]
    synd_t = jnp.pad(synd, ((0, 0), (0, m_pad - m))).T
    skip_t = jnp.broadcast_to(skip[None, :], (8, B))

    kw = dict(n=n, m=m, W=W, r=r, lam=lam, lam_pad=lam_pad, lamw=lamw,
              block=block, interpret=interpret)
    e0p, ewp = _osd_cs_impl(h_t, synd_t, skip_t, **kw)

    # back to original column coordinates: e[b, perm[b, c']] = e_p[b, c']
    e0p = e0p.T[:B_in, :n]  # [B, n] permuted coords
    ewp = ewp.T[:B_in, :n]
    bidx = jnp.arange(B_in)[:, None]
    perm_in = perm[:B_in]
    e0 = jnp.zeros((B_in, n), jnp.int32).at[bidx, perm_in].set(e0p)
    e_w = jnp.zeros((B_in, n), jnp.int32).at[bidx, perm_in].set(ewp)
    return e0, e_w
