"""Pallas TPU kernel: per-sample streamed OSD for large (n ~ 10^4) codes.

The fused batch-on-lanes osd kernel (``pallas_osd.py``) keeps two
``[W, m_pad, block]`` copies of the packed matrix VMEM-resident with
``block >= 128`` samples — ~780 MB at lifted-product scale, far past the
~16 MB VMEM budget.  The XLA fallback (``decoder/osd.py:_eliminate``)
round-trips the ``[B, m, W]`` matrix through HBM on every one of the ~rank
column steps (~1.4 TB of HBM traffic per 16-sample bucket at n = 10^4:
the 68.6 synd/s wall of BASELINE.md row 5 / round-3 VERDICT weak item 1).

This kernel processes ONE sample per grid step so a single packed-matrix
copy (~6 MB at n = 10^4) stays VMEM-resident for the whole elimination:

- **Layout [W, m_pad]**: packed words over n on SUBLANES, check rows on
  LANES.  The per-step pivot-column word is a dynamic sublane-axis read
  (addressing hardware), pivot-row extraction is a masked cross-lane
  reduction, and the Jordan update is one full-array XOR pass — the only
  per-step full passes.  Per-sample per-step scalars (pivot row, rank,
  tie keys) live in SREGs/SMEM.
- **Pre-permuted columns** (the ``pallas_osd._permuted_packed_h``
  pre-pass, an MXU matmul): the visiting order is 0..n-1, so word/bit
  indices are scalars derived from the loop counter.
- **Input via manual DMA** from HBM (``pl.ANY`` + ``make_async_copy``):
  a grid-blocked VMEM input would be double-buffered by Mosaic, blowing
  the budget at 2 x 6 MB + scratch.
- **Compact outputs**: instead of shipping the reduced ``[W, m_pad]``
  matrix back per sample, the kernel emits lane vectors (reduced
  syndrome, winner-adjusted syndrome, pivot-column id per row) plus the
  winner ids; the caller scatters them into ``[B, n]`` error vectors in
  original coordinates (O(B * m) host-free XLA work).

Semantics are bit-identical to the generic ``osd_decode`` XLA path
(reference contract ``README.md:185-187``: osd0 + the combination sweep
of arXiv:2005.07016 at ``osd_order``): same pivot selection (first
eligible row), same candidate order (zero, weight-1 over ALL of T in
reliability order, weight-2 lexicographic pairs over the first ``order``
T columns), same first-minimum tie-break.  Validated in
``tests/test_osd_large.py`` (interpret mode) and on hardware by
``bench_large.py``'s agreement gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_osd import _permuted_packed_h

__all__ = ["osd_cs_large_pallas"]

_BIG = 1 << 28  # demotion offset for pivot/out-of-range candidates


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _osd_large_kernel(synd_ref, skip_ref, hp_hbm,
                      sred_ref, sbest_ref, rowpiv_ref, meta_ref,
                      h_scr, sem, pivw_smem, tcid_smem,
                      *, n, m, W, W_pad, r, m_pad, lam, lamw, base):
    """One grid step = one sample's full eliminate + combination sweep.

    Refs (small blocks carry 8 identical/padded sublane rows — Mosaic
    requires block sublane dims divisible by 8; row 0 is the payload):
      synd_ref  [8, m_pad] int32   syndrome bits (rows on lanes)
      skip_ref  [8, 128]   int32   1 = skip this sample (all rows equal)
      hp_hbm    [B, W_pad, m_pad] int32 (HBM) pre-permuted packed matrices
                (words padded to a multiple of 8: DMA slice dims must be
                aligned to the (8, 128) tiling; pad words are zero)
      sred_ref  [8, m_pad] int32   reduced syndrome (e0 values at pivot rows)
      sbest_ref [8, m_pad] int32   winner-adjusted syndrome (osdw values)
      rowpiv_ref[8, m_pad] int32   permuted column id of row's pivot (-1)
      meta_ref  [8, 128]   int32   lane 0: bt1, 1: bt2, 2: rank found
      h_scr     [W, m_pad] int32   VMEM working matrix (eliminated in place)
      pivw_smem [W]        int32   pivot-column bitmask words
      tcid_smem [>=max(lam,1)] int32  permuted ids of the first lam T cols
    """
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(hp_hbm.at[b], h_scr, sem)
    cp.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    iota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    valid = lane < m

    def zero_pivw(i, c):
        pivw_smem[i] = 0
        return c

    jax.lax.fori_loop(0, W, zero_pivw, 0)
    for sl in range(max(lam, 1)):
        tcid_smem[sl] = -1

    # scalar via reduction (all lanes carry the same flag; single-element
    # VMEM reads lower poorly in Mosaic)
    skip = jnp.max(skip_ref[:, :])
    live = skip == 0
    s0 = synd_ref[0:1, :]  # [1, m_pad] payload row
    cp.wait()

    # ---- phase 1: in-place Gauss-Jordan over permuted columns ----------
    # All per-sample row state (syndrome, used-row mask, pivot ids) lives
    # in the spare sublane rows of the OUTPUT refs so every mutation can
    # sit under pl.when(has): dependent (T) columns — ~half of all visited
    # columns at lifted-product scale (k/n ~ 0.52) — then cost only the
    # column-word read, one fused eligibility/min reduction, and the loop
    # scalars.  (Round-5 also tried tail-restricted chunked updates with a
    # compact T-matrix — 2x SLOWER on hardware: Mosaic's dynamic-bound
    # loop overhead dwarfs the traffic saved; flat full-array ops win.)
    sred_ref[0:1, :] = s0
    rowpiv_ref[0:1, :] = jnp.full((1, m_pad), -1, jnp.int32)
    rowpiv_ref[1:2, :] = jnp.zeros((1, m_pad), jnp.int32)  # used-row mask

    def step(carry):
        t, rr = carry
        w = jnp.minimum(t >> 5, W - 1)
        bit = t & 31
        hw = h_scr[pl.ds(w, 1), :]  # [1, m_pad] dynamic sublane read
        colbits = (hw >> bit) & 1

        elig = (colbits == 1) & (rowpiv_ref[1:2, :] == 0) & valid
        # fused has/argmin: one cross-lane reduction for both
        pr = jnp.min(jnp.where(elig, lane, jnp.int32(2**30)))
        has = (pr < jnp.int32(2**30)) & (rr < r) & (t < n)

        @pl.when(has)
        def _():
            ohm = -((lane == pr)).astype(jnp.int32)  # [1, m_pad]
            elimm = -((colbits == 1) & (ohm == 0)).astype(jnp.int32)
            hall = h_scr[:, :]
            piv = jnp.sum(hall & ohm, axis=1, keepdims=True)  # [W, 1]
            h_scr[:, :] = hall ^ (piv & elimm)
            sr = sred_ref[0:1, :]
            s_piv = jnp.sum(sr & ohm)  # scalar
            sred_ref[0:1, :] = sr ^ (elimm & s_piv)
            rowpiv_ref[0:1, :] = jnp.where(ohm != 0, t, rowpiv_ref[0:1, :])
            rowpiv_ref[1:2, :] = rowpiv_ref[1:2, :] | (ohm & 1)
            pivw_smem[w] = pivw_smem[w] | (jnp.int32(1) << bit)

        return t + 1, rr + has.astype(jnp.int32)

    def unfinished(carry):
        t, rr = carry
        return (t < n) & (rr < r)

    # the exit test costs a scalar sync; run CHUNK columns per check
    # (overrun steps are no-ops: `has` is gated by rr < r and t < n)
    CHUNK = 16

    def chunk(carry):
        return jax.lax.fori_loop(0, CHUNK, lambda _, c: step(c), carry)

    _, rr = jax.lax.while_loop(unfinished, chunk, (jnp.int32(0), skip * r))
    s = sred_ref[0:1, :]
    rowpiv = rowpiv_ref[0:1, :]

    # ---- phase 2: weight-1 sweep over all columns + T-column collect ----
    w0 = jnp.sum(s & valid.astype(jnp.int32))
    best_key = w0 * base  # zero candidate, rank 0
    bt1 = jnp.int32(-1)
    bt2 = jnp.int32(-1)
    sweep = lam > 0

    if sweep:
        buf0 = tuple(jnp.zeros((1, m_pad), jnp.int32) for _ in range(lamw))

        def w1_word(w, carry):
            best_key, bt1, bt2, tt, buf = carry
            buf = list(buf)
            hw = h_scr[pl.ds(w, 1), :]
            pv = pivw_smem[w]
            for bit in range(32):
                c = w * 32 + bit
                in_range = c < n
                colbits = (hw >> bit) & 1
                is_piv = (pv >> bit) & 1
                wgt = jnp.sum((colbits ^ s) & valid.astype(jnp.int32)) + 1
                key = (wgt * base + 1 + c
                       + jnp.int32(_BIG) * is_piv
                       + jnp.int32(_BIG) * (1 - in_range.astype(jnp.int32)))
                better = key < best_key
                best_key = jnp.where(better, key, best_key)
                bt1 = jnp.where(better, c, bt1)
                bt2 = jnp.where(better, jnp.int32(-1), bt2)

                # record this column as T slot `tt` (reliability order)
                rec = (is_piv == 0) & (tt < lam) & in_range

                @pl.when(rec)
                def _():
                    tcid_smem[tt] = c

                shift = tt & 31
                for lw in range(lamw):
                    hit = rec & ((tt >> 5) == lw)
                    buf[lw] = buf[lw] | jnp.where(
                        hit, colbits << shift, 0
                    )
                tt = tt + rec.astype(jnp.int32)
            return best_key, bt1, bt2, tt, tuple(buf)

        def run_w1(carry):
            return jax.lax.fori_loop(0, W, w1_word, carry)

        carry = (best_key, bt1, bt2, skip * lam, buf0)
        best_key, bt1, bt2, tt, buf = jax.lax.cond(
            live, run_w1, lambda c: c, carry
        )

    # ---- phase 3: weight-2 sweep over pairs of the first lam T columns --
    if sweep and lam >= 2:
        validm = valid.astype(jnp.int32)

        def unpack(idx):
            """Bits of T slot ``idx`` (traced scalar) from the packed buf."""
            sel = jnp.zeros((1, m_pad), jnp.int32)
            for lw in range(lamw):
                sel = sel | jnp.where((idx >> 5) == lw, buf[lw], 0)
            return (sel >> (idx & 31)) & 1

        def pair_outer(st):
            a, best_key, bt1, bt2 = st
            xa = s ^ unpack(a)
            t1a = tcid_smem[a]
            for pb in range(1, lam):
                colb = (buf[pb >> 5] >> (pb & 31)) & 1  # static shift
                wgt = jnp.sum((xa ^ colb) & validm) + 2
                rank = jnp.int32(n + 1) + a * lam + pb
                # pairs require pb > a: demote pb <= a out of contention
                key = (wgt * base + rank
                       + jnp.int32(_BIG) * (a >= pb).astype(jnp.int32))
                better = key < best_key
                best_key = jnp.where(better, key, best_key)
                bt1 = jnp.where(better, t1a, bt1)
                bt2 = jnp.where(better, tcid_smem[pb], bt2)
            return a + 1, best_key, bt1, bt2

        _, best_key, bt1, bt2 = jax.lax.while_loop(
            lambda st: (st[0] < lam - 1) & live,
            pair_outer,
            (jnp.int32(0), best_key, bt1, bt2),
        )

    # ---- phase 4: winner residual + outputs ----------------------------
    def colbits_of(tid):
        """[1, m_pad] bits of permuted column ``tid`` (scalar); 0 if -1."""
        w = jnp.clip(tid >> 5, 0, W - 1)
        row = h_scr[pl.ds(w, 1), :]
        bits = (row >> jnp.clip(tid & 31, 0, 31)) & 1
        return bits & -(tid >= 0).astype(jnp.int32)

    sbest = s ^ colbits_of(bt1) ^ colbits_of(bt2)

    sred_ref[:, :] = jnp.broadcast_to(s, (8, m_pad))
    sbest_ref[:, :] = jnp.broadcast_to(sbest, (8, m_pad))
    rowpiv_ref[:, :] = jnp.broadcast_to(rowpiv, (8, m_pad))
    meta_ref[:, :] = jnp.broadcast_to(
        jnp.where(
            iota128 == 0, bt1,
            jnp.where(iota128 == 1, bt2, jnp.where(iota128 == 2, rr, 0)),
        ),
        (8, 128),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "W", "r", "m_pad", "lam", "lamw", "base",
                     "interpret"),
)
def _osd_large_impl(hp, synd_t, skip_t, *, n, m, W, r, m_pad, lam, lamw,
                    base, interpret=False):
    B = synd_t.shape[0]
    W_pad = hp.shape[1]
    kernel = functools.partial(
        _osd_large_kernel, n=n, m=m, W=W, W_pad=W_pad, r=r, m_pad=m_pad,
        lam=lam, lamw=lamw, base=base,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((None, 8, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W_pad, m_pad), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((W,), jnp.int32),
            pltpu.SMEM((max(lam, 1),), jnp.int32),
        ],
    )(synd_t, skip_t, hp)


def osd_cs_large_pallas(graph, perm, synd, *, osd_order: int, skip=None,
                        interpret: bool = False):
    """Streamed per-sample osd_cs (or osd0 at ``osd_order=0``) decode.

    Same signature and return contract as ``pallas_osd.osd_cs_pallas``:
    returns ``(e0 [B, n] int32, e_w [B, n] int32)`` in ORIGINAL column
    coordinates (rows where ``skip`` are undefined; caller masks).  Use
    when ``pallas_osd.fused_osd_fits`` says the batch-on-lanes kernel
    cannot fit — each grid step holds only ONE ~``4*W*m_pad``-byte packed
    matrix in VMEM, so codes up to n ~ 2-3 x 10^4 compile.
    """
    m, n, W, r = graph.m, graph.n, graph.num_words, graph.rank
    k = n - r
    lam = max(min(int(osd_order), k), 0)
    lamw = max(-(-lam // 32), 1)
    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, 128)
    base = 1 << max(int(n + lam * lam + 2).bit_length(), 8)
    if (m_pad + 3) * base + 2 * _BIG >= 2**31:
        raise ValueError(
            f"osd_cs_large tie-break keys overflow int32 for m={m}, n={n}"
        )

    B = perm.shape[0]
    perm = jnp.asarray(perm, jnp.int32)
    synd = jnp.asarray(synd, jnp.int32)
    if skip is None:
        skip = jnp.zeros((B,), jnp.int32)
    else:
        skip = jnp.asarray(skip).astype(jnp.int32)

    hp3 = _permuted_packed_h(graph, perm, W, m_pad, n_pad)  # [W, m_pad, B]
    hp = jnp.transpose(hp3, (2, 0, 1))  # [B, W, m_pad], batch-major for DMA
    W_pad = _round_up(W, 8)  # DMA slices must align to the (8,128) tiling
    if W_pad != W:
        hp = jnp.pad(hp, ((0, 0), (0, W_pad - W), (0, 0)))
    # small per-sample blocks carry 8 sublane rows (Mosaic block minimum);
    # row 0 is the payload, the rest zero-pad / copies
    synd_t = jnp.pad(
        jnp.pad(synd, ((0, 0), (0, m_pad - m)))[:, None, :],
        ((0, 0), (0, 7), (0, 0)),
    )
    skip_t = jnp.broadcast_to(
        skip[:, None, None], (B, 8, 128)
    ).astype(jnp.int32)

    sred, sbest, rowpiv, meta = _osd_large_impl(
        hp, synd_t, skip_t, n=n, m=m, W=W, r=r, m_pad=m_pad, lam=lam,
        lamw=lamw, base=base, interpret=interpret,
    )
    sred, sbest, rowpiv, meta = (
        sred[:, 0, :], sbest[:, 0, :], rowpiv[:, 0, :], meta[:, 0, :]
    )

    # scatter the compact outputs into [B, n] original-coordinate vectors:
    # pivot rows carry their column's solution bit; masked rows aim at
    # column perm[b, 0] with a zero value (no-op add)
    bidx = jnp.arange(B)[:, None]
    mask = (rowpiv >= 0).astype(jnp.int32)
    cols = jnp.take_along_axis(perm, jnp.clip(rowpiv, 0, n - 1), axis=1)
    e0 = jnp.zeros((B, n), jnp.int32).at[bidx, cols].add(sred & mask)
    ew = jnp.zeros((B, n), jnp.int32).at[bidx, cols].add(sbest & mask)

    # winner T bits (permuted ids -> original columns)
    bflat = jnp.arange(B)
    for bt in (meta[:, 0], meta[:, 1]):
        c_orig = jnp.take_along_axis(
            perm, jnp.clip(bt, 0, n - 1)[:, None], axis=1
        )[:, 0]
        ew = ew.at[bflat, c_orig].add((bt >= 0).astype(jnp.int32))

    return e0, ew
