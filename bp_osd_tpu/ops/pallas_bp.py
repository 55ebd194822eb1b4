"""Pallas TPU kernel: fused batched min-sum/product-sum BP decode loop.

The XLA BP path (``decoder/bp.py``) round-trips messages through HBM every
iteration.  This kernel keeps the whole message state resident in VMEM for a
block of samples and runs the entire iteration loop in one program.

Round-3 redesign (flat 2D layout + grouped operators):

- **Every tensor in the kernel is 2D** with the sample batch on sublanes and
  checks/variables/edges on lanes.  The round-2 kernel carried messages as
  ``[BS, wr, m_pad]`` and reshaped to ``[BS, wr*m_pad]`` around each matmul;
  that reshape moves the batch axis between the untiled and sublane
  positions — a full Mosaic relayout of the message state twice per
  iteration.  Here messages stay flat ``[BS, E]`` (edge ``e = slot*m_pad +
  check``) and the check-node update reads static 256-lane slices per slot,
  so no relayout ever happens.
- **Grouped (Kronecker-aware) routing operators**: a hypergraph-product
  check matrix is ``hx = [h1 (x) I | I (x) h2^T]`` (reference
  ``src/bposd/hgp.py:48-50``) — every check's incident variables split into
  two column sectors.  ``build_bp_operators`` partitions the columns at
  128-aligned boundaries and emits one one-hot operator per group, so the
  var<->edge matmuls contract only over each sector's variables instead of
  the whole padded column space.  For the [[400,16,6]] flagship this halves
  the MXU tile count per iteration (contract 256+256 lanes over 4+3 slots
  instead of 512 lanes over 7 slots).
- **Resumable message state**: ``emit_state=True`` returns the v2c message
  carry after exactly ``max_iter`` iterations; ``v2c_init``/``it0`` restart
  from it.  The staged pipeline (``decoder/pipeline.py``) uses this to
  continue stage-1 failures at iteration ``stage1_iters + 1`` instead of
  re-decoding from scratch — the trajectory is identical to a straight
  ``max_iter`` run because BP is deterministic and the adaptive min-sum
  scale ``alpha_t = 1 - 2^-t`` (reference ``README.md:184``) depends only
  on the global iteration number, which resumes exactly.

Semantics match ``decoder.bp.bp_decode`` (parallel schedule, per-sample
freeze at first convergence); small float differences are possible because
variable-node sums accumulate per column group (matmul partial order).
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
_BIG_BITS = int(np.float32(_BIG).view(np.int32))  # magnitude cap, as bits
_TANH_CLIP = 1.0 - 1e-7


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _group_plan(graph):
    """Choose 128-aligned column-group boundaries minimizing MXU tiles.

    Returns a list of ``(col_start, col_end)`` covering ``[0, n)``.  The
    cost of a plan is ``sum_g ceil(ngpad/128) * wr_g`` — proportional to
    K-tiles x N-tiles of the routing matmuls.  Only splits that beat the
    single-group baseline are taken (generic codes fall back to G=1).
    """
    m, n = graph.m, graph.n
    n_pad = _round_up(n, 128)

    def group_wr(c0, c1):
        cnt = np.count_nonzero((graph.H[:, c0:c1] != 0), axis=1)
        return int(cnt.max()) if cnt.size else 0

    def cost(bounds):
        t = 0
        for c0, c1 in bounds:
            ngpad = _round_up(c1 - c0, 128)
            t += (ngpad // 128) * group_wr(c0, c1)
        return t

    best = [(0, n)]
    best_cost = cost(best)
    for c in range(128, n_pad - 127, 128):
        if c >= n:
            break
        plan = [(0, c), (c, n)]
        pc = cost(plan)
        if pc < best_cost:
            best, best_cost = plan, pc
    return best


def build_bp_operators(graph):
    """Host-built dense operators for the fused BP kernel.

    Returns a dict of np arrays (shapes carry all static metadata):
      ev{g}   [ngpad_g, wr_g*m_pad] f32 one-hot var->edge operator of
              column group g (groups tile ``[0, n_pad)`` in order; interior
              boundaries are 128-aligned so lane index == column index)
      h_t     [n_pad, m_pad]        f32: H^T (variable -> check incidence)
      mask    [wr_flat, m_pad]      f32: 1 on real (slot, check) pairs,
              slots concatenated per group
    """
    m, n = graph.m, graph.n
    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, 128)
    groups = _group_plan(graph)

    ops = {}
    masks = []
    for g, (c0, c1) in enumerate(groups):
        ngpad = _round_up(c1 - c0, 128)
        sub = graph.H[:, c0:c1] != 0
        rows, cols = np.nonzero(sub)  # row-major: per-row cols ascending
        counts = np.bincount(rows, minlength=m)
        wr_g = int(counts.max()) if rows.size else 1
        slot = (
            np.concatenate([np.arange(c) for c in counts])
            if rows.size
            else np.zeros(0, int)
        )
        ev = np.zeros((ngpad, wr_g * m_pad), dtype=np.float32)
        ev[cols, slot * m_pad + rows] = 1.0
        ops[f"ev{g}"] = ev
        mk = np.zeros((wr_g, m_pad), dtype=np.float32)
        mk[slot, rows] = 1.0
        masks.append(mk)

    h_t = np.zeros((n_pad, m_pad), dtype=np.float32)
    h_t[:n, :m] = graph.H.T
    ops["h_t"] = h_t
    ops["mask"] = np.concatenate(masks, axis=0)
    return ops


def _bp_kernel(*refs, method, max_iter, it0, alpha_fixed, widths, slots,
               m_pad, n_pad, BS, resume, emit_state, msg_dtype=jnp.float32):
    """Flat-layout fused BP loop; see module docstring for the design.

    refs = (synd, llr0, skip, [v2c_in], ht, mask, ev0.., hard, llr, conv,
    iters, [v2c_out]).  ``widths``/``slots`` are per-group static tuples
    (padded lane width, slot count).
    """
    G = len(widths)
    i = 0
    synd_ref = refs[i]; i += 1
    llr0_ref = refs[i]; i += 1
    skip_ref = refs[i]; i += 1
    v2c_in_ref = None
    if resume:
        v2c_in_ref = refs[i]; i += 1
    ht_ref = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    ev_refs = [refs[i + g] for g in range(G)]
    i += G
    hard_ref = refs[i]; i += 1
    llr_ref = refs[i]; i += 1
    conv_ref = refs[i]; i += 1
    iters_ref = refs[i]; i += 1
    v2c_out_ref = refs[i] if emit_state else None

    wrf = sum(slots)
    E = wrf * m_pad
    synd_i = synd_ref[:, :]  # [BS, m_pad] int32 0/1
    syn_f = synd_i.astype(jnp.float32)
    syn_sign = 1.0 - 2.0 * syn_f
    syn_bool = synd_i != 0
    llr0 = llr0_ref[:, :]
    ht = ht_ref[:, :]
    evs = [r[:, :] for r in ev_refs]
    masks = [mask_ref[s : s + 1, :] > 0 for s in range(wrf)]  # [1, m_pad]

    # static per-group lane windows (columns) and edge windows
    col_off, edge_off = [], []
    c = e = 0
    for g in range(G):
        col_off.append(c)
        edge_off.append(e)
        c += widths[g]
        e += slots[g] * m_pad

    def var_to_edge(x):  # [BS, n_pad] -> [BS, E]
        parts = []
        for g in range(G):
            xg = x[:, col_off[g] : col_off[g] + widths[g]]
            parts.append(
                jax.lax.dot_general(
                    xg.astype(msg_dtype), evs[g], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.concatenate(parts, axis=1) if G > 1 else parts[0]

    def edge_to_var(msgs):  # [BS, E] -> [BS, n_pad]
        outs = []
        for g in range(G):
            mg = msgs[:, edge_off[g] : edge_off[g] + slots[g] * m_pad]
            outs.append(
                jax.lax.dot_general(
                    mg.astype(msg_dtype), evs[g], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.concatenate(outs, axis=1) if G > 1 else outs[0]

    def check_update(v2c, it):
        sl = [v2c[:, s * m_pad : (s + 1) * m_pad] for s in range(wrf)]
        if method == "minimum_sum":
            # Lean formulation (round 5) — bit-identical outputs, ~1.7x
            # fewer VPU passes than the min1/first-hit/min2 scan it
            # replaces (stage-2 BP is VPU-bound on this function):
            #   * pad (slot, check) entries of v2c are kept at +_BIG by
            #     the emit below, so negs/mags need no mask pass;
            #   * sign products are bool XORs (only the parity of the
            #     negative count was ever used);
            #   * |m| compares run on bitcast int32 magnitudes (for
            #     non-NaN floats, integer order on sign-cleared bits ==
            #     float order on magnitudes);
            #   * the exclusive min over slots is a prefix/suffix min
            #     scan — exactly min_{s' != s}, which is what the old
            #     where(first-hit, min2, min1) computed, with no tie
            #     bookkeeping (duplicated minima give the same value).
            # Sign via m < 0.0 (not the sign bit): -0.0 must count as
            # non-negative, matching the formulation this replaces.
            sbits = [x < 0.0 for x in sl]
            sp = syn_bool
            for s in range(wrf):
                sp = sp ^ sbits[s]
            mags = [
                jax.lax.bitcast_convert_type(x, jnp.int32)
                & jnp.int32(0x7FFFFFFF)
                for x in sl
            ]
            fwd = [None] * wrf  # fwd[s] = min(mags[0..s-1])
            acc = mags[0]
            for s in range(1, wrf):
                fwd[s] = acc
                acc = jnp.minimum(acc, mags[s])
            bwd = [None] * wrf  # bwd[s] = min(mags[s+1..])
            acc = mags[wrf - 1]
            for s in range(wrf - 2, -1, -1):
                bwd[s] = acc
                acc = jnp.minimum(acc, mags[s])
            if alpha_fixed == 0.0:
                alpha = 1.0 - jnp.exp2(-it.astype(jnp.float32))
            else:
                alpha = alpha_fixed
            parts = []
            for s in range(wrf):
                if s == 0:
                    excl_b = bwd[0]
                elif s == wrf - 1:
                    excl_b = fwd[s]
                else:
                    excl_b = jnp.minimum(fwd[s], bwd[s])
                # saturate at _BIG — identical across implementations (see
                # decoder/bp.py:_check_update_min_sum); integer min on
                # magnitude bits == float min
                excl_b = jnp.minimum(excl_b, jnp.int32(_BIG_BITS))
                excl = jax.lax.bitcast_convert_type(excl_b, jnp.float32) * alpha
                neg = sp ^ sbits[s]
                val = jnp.where(neg, -excl, excl)
                # pad entries emit -_BIG so the v2c update (var sums are 0
                # there) regenerates the +_BIG pad invariant
                parts.append(jnp.where(masks[s], val, -_BIG))
            return jnp.concatenate(parts, axis=1) if wrf > 1 else parts[0]
        else:  # product_sum
            ts = [jnp.where(masks[s], jnp.tanh(0.5 * sl[s]), 1.0)
                  for s in range(wrf)]
            ones = jnp.ones_like(ts[0])
            fwd = [ones]
            for s in range(wrf - 1):
                fwd.append(fwd[-1] * ts[s])
            bwd = [ones] * wrf
            for s in range(wrf - 2, -1, -1):
                bwd[s] = bwd[s + 1] * ts[s + 1]
            parts = []
            for s in range(wrf):
                excl = jnp.clip(
                    syn_sign * fwd[s] * bwd[s], -_TANH_CLIP, _TANH_CLIP
                )
                # 2*atanh(x) = log((1+x)/(1-x)); atanh has no Mosaic lowering
                val = jnp.log((1.0 + excl) / (1.0 - excl))
                parts.append(jnp.where(masks[s], val, 0.0))
            return jnp.concatenate(parts, axis=1) if wrf > 1 else parts[0]

    REP = n_pad // 128
    ones_m128 = jnp.ones((m_pad, 128), msg_dtype)

    def body(state):
        it, v2c, hard_out, llr_out, iters, conv = state
        c2v = check_update(v2c, it)
        total = llr0 + edge_to_var(c2v)
        v2c_next = var_to_edge(total) - c2v
        hard = (total <= 0).astype(jnp.float32)
        parity = jnp.mod(
            jnp.dot(hard.astype(msg_dtype), ht,
                    preferred_element_type=jnp.float32),
            2.0,
        )
        neq = (parity != syn_f).astype(msg_dtype)  # [BS, m_pad]
        miss = jnp.dot(neq, ones_m128, preferred_element_type=jnp.float32)
        ok = (miss == 0.0).astype(jnp.float32)  # [BS, 128]
        # valid: the loop runs in CHUNK-iteration bursts between exit
        # checks, so the body can overrun max_iter — those steps must not
        # touch outputs or convergence
        valid = it <= max_iter
        live = (conv == 0.0) & valid  # [BS, 128] bool
        liveN = jnp.concatenate([live] * REP, axis=1) if REP > 1 else live
        hard_out = jnp.where(liveN, hard, hard_out)
        llr_out = jnp.where(liveN, total, llr_out)
        # iters := it while live; `it` advances by 1 per live step so this
        # running sum (from the it0 base) is identical and avoids a
        # dynamic-scalar select
        iters = iters + live.astype(jnp.float32)
        conv = jnp.maximum(conv, jnp.where(valid, ok, 0.0))
        return it + 1, v2c_next, hard_out, llr_out, iters, conv

    def cond(state):
        it = state[0]
        conv = state[5]
        return (it <= max_iter) & (jnp.min(conv) == 0.0)

    # The exit test is a cross-lane reduction plus a scalar sync; checking
    # it every iteration costs more than the iterations it saves, so run
    # CHUNK iterations per check (overrun steps are no-ops via the `valid`
    # gate above).  When the v2c state is emitted it must correspond to
    # EXACTLY max_iter updates, so CHUNK must divide the iteration count.
    span = max_iter - it0
    if emit_state:
        CHUNK = next(c for c in (8, 4, 2, 1) if span % c == 0)
    else:
        CHUNK = 8 if span <= 64 else 32

    def chunk(state):
        return jax.lax.fori_loop(0, CHUNK, lambda _, s: body(s), state)

    # carry inits derived from real inputs (not jnp.zeros): a splat
    # constant gets the replicated {*,*} layout, the body's updates are
    # tiled {0,0}, and Mosaic cannot relayout tiled -> replicated at the
    # loop back-edge.  conv starts at the skip flags: skipped samples are
    # born "converged", so an all-skip block exits before iteration one.
    skipf = skip_ref[:, :].astype(jnp.float32)  # [BS, 128]
    v2c0 = v2c_in_ref[:, :] if resume else var_to_edge(llr0)
    if method == "minimum_sum":
        # pad (slot, check) invariant: +_BIG (positive, huge magnitude)
        # lets check_update skip per-slot mask passes on negs and mags;
        # the -_BIG emitted there restores the invariant each iteration
        # (v2c_pad = 0 - (-_BIG)).  Idempotent, so resume states (which
        # already carry it) pass through unchanged.
        maskflat = jnp.concatenate(
            [jnp.broadcast_to(masks[s], (1, m_pad)) for s in range(wrf)],
            axis=1,
        ) if wrf > 1 else jnp.broadcast_to(masks[0], (1, m_pad))
        v2c0 = jnp.where(maskflat, v2c0, _BIG)
    init = (
        jnp.int32(it0 + 1),
        v2c0,
        llr0 * 0.0,
        llr0,
        skipf * 0.0 + float(it0),
        skipf,
    )
    _, v2c_fin, hard_out, llr_out, iters, conv = jax.lax.while_loop(
        cond, chunk, init
    )

    hard_ref[:, :] = hard_out.astype(jnp.int32)
    llr_ref[:, :] = llr_out
    conv_ref[:, :] = conv.astype(jnp.int32)
    iters_ref[:, :] = iters.astype(jnp.int32)
    if emit_state:
        v2c_out_ref[:, :] = v2c_fin


@functools.partial(
    jax.jit,
    static_argnames=("method", "max_iter", "it0", "alpha_fixed", "widths",
                     "slots", "m_pad", "n_pad", "block", "resume",
                     "emit_state", "interpret", "msg_dtype", "vmem_limit"),
)
def _bp_pallas_impl(synd, llr0, skip, v2c_in, ht, mask, *evs,
                    method, max_iter, it0, alpha_fixed, widths, slots,
                    m_pad, n_pad, block, resume, emit_state,
                    interpret=False, msg_dtype="float32", vmem_limit=None):
    B = synd.shape[0]
    grid = B // block
    wrf = sum(slots)
    E = wrf * m_pad
    kernel = functools.partial(
        _bp_kernel, method=method, max_iter=max_iter, it0=it0,
        alpha_fixed=alpha_fixed, widths=widths, slots=slots,
        m_pad=m_pad, n_pad=n_pad, BS=block, resume=resume,
        emit_state=emit_state, msg_dtype=jnp.dtype(msg_dtype),
    )

    def bspec(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [bspec(m_pad), bspec(n_pad), bspec(128)]
    args = [synd, llr0, skip]
    if resume:
        in_specs.append(bspec(E))
        args.append(v2c_in)
    in_specs.append(
        pl.BlockSpec((n_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    in_specs.append(
        pl.BlockSpec((wrf, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    args += [ht, mask]
    for g, ev in enumerate(evs):
        in_specs.append(
            pl.BlockSpec(ev.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ev)

    out_specs = [bspec(n_pad), bspec(n_pad), bspec(128), bspec(128)]
    out_shape = [
        jax.ShapeDtypeStruct((B, n_pad), jnp.int32),
        jax.ShapeDtypeStruct((B, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32),
    ]
    if emit_state:
        out_specs.append(bspec(E))
        out_shape.append(jax.ShapeDtypeStruct((B, E), jnp.float32))

    # plain pallas interpret (pure XLA lowering), NOT the Mosaic TPU
    # simulator: the simulator's io_callback buffer machinery deadlocks
    # under multi-device SPMD execution (shard_map on the CPU mesh)
    kw = {}
    if vmem_limit:
        # large codes (e.g. the [[900,36,10]] HGP, whose routing
        # operators alone are ~12 MB) exceed the 16 MB scoped-vmem
        # DEFAULT; v5e has 128 MB physical VMEM, so raise the per-kernel
        # limit instead of shrinking the block into the ground
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)
        )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **kw,
    )(*args)


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
    v2c_init=None,
    it0: int = 0,
    emit_state: bool = False,
):
    """Fused-BP decode; returns ``(hard [B, n] uint8, llr [B, n] f32,
    converged [B] bool, iterations [B] int32)`` like ``bp_decode``, plus the
    final ``v2c [B, E]`` message state when ``emit_state=True``.

    ``operators`` is the dict from :func:`build_bp_operators` — pass it
    through any enclosing jit as an argument.

    ``skip`` ([B] bool/int, optional) marks samples born "converged": their
    ``hard`` is zeros, ``llr`` is the prior, ``converged`` reads True, and
    an all-skip block exits before its first iteration — sort the batch so
    skips cluster into whole blocks (used by the staged long-``max_iter``
    pipeline, which resumes only prior BP failures).

    ``v2c_init``/``it0`` resume a previous run's message state from
    iteration ``it0 + 1`` (see module docstring); ``iterations`` then
    reports the TOTAL count from iteration 1.
    """
    method = normalize_bp_method(bp_method)
    if max_iter == 0:
        max_iter = graph.n
    m, n = graph.m, graph.n
    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, 128)

    evs = []
    g = 0
    while f"ev{g}" in operators:
        evs.append(jnp.asarray(operators[f"ev{g}"]))
        g += 1
    widths = tuple(int(e.shape[0]) for e in evs)
    slots = tuple(int(e.shape[1]) // m_pad for e in evs)
    E = sum(slots) * m_pad

    syndromes = jnp.asarray(syndromes)
    if syndromes.ndim == 1:
        syndromes = syndromes[None, :]
    B_in = syndromes.shape[0]
    # VMEM sizing: the kernel keeps the routing operators plus per-block
    # message state (v2c carry/in/out, totals, outputs) resident.  The
    # flagship fits the 16 MB scoped-vmem DEFAULT at its tuned block=128;
    # larger codes first shrink the block, then — since v5e carries
    # 128 MB of physical VMEM — raise the per-kernel scoped limit (the
    # [[625]]/[[900]] HGPs measured 18.3/19.5 MB wants; their operators
    # alone reach 12 MB, which no block size can shrink away).
    # Static .size/.shape only: the operators arrive as TRACERS inside an
    # enclosing jit (the sim passes them as pytree arguments).
    dt_b = jnp.dtype(msg_dtype).itemsize
    ops_bytes = 4 * (
        sum(int(e.size) for e in evs)
        + int(np.prod(operators["h_t"].shape))
    )

    def vmem_est(b):
        # 5 E-sized arrays covers the worst (resume + emit_state)
        # variant: v2c block in (dbl-buffered) + carry + out (dbl-buf)
        per_block = b * (5 * E * dt_b + (6 * n_pad + 3 * m_pad) * 4)
        return ops_bytes + int(1.4 * per_block)

    while block > 32 and vmem_est(block) > 40 * 1024 * 1024:
        block //= 2
    vmem_limit = (
        None if vmem_est(block) <= 13 * 1024 * 1024
        else min(2 * vmem_est(block), 110 * 1024 * 1024)
    )
    block = min(block, _round_up(B_in, 8))
    # pad the batch to a whole number of blocks; padded rows are born
    # "converged" (skip=1), so an all-pad block exits before iteration one
    B = _round_up(B_in, block)
    pad_b = B - B_in

    synd_p = jnp.pad(
        syndromes.astype(jnp.int32), ((0, pad_b), (0, m_pad - m))
    )
    llr0 = jnp.broadcast_to(jnp.asarray(llr0, jnp.float32), (B_in, n))
    llr0_p = jnp.pad(
        llr0, ((0, pad_b), (0, n_pad - n)), constant_values=1.0
    )
    if skip is None:
        skip_v = jnp.zeros((B_in,), jnp.int32)
    else:
        skip_v = jnp.asarray(skip).astype(jnp.int32)
    skip_p = jnp.broadcast_to(
        jnp.pad(skip_v, (0, pad_b), constant_values=1)[:, None], (B, 128)
    )
    resume = v2c_init is not None
    v2c_in = (
        jnp.pad(v2c_init, ((0, pad_b), (0, 0)))
        if resume
        else jnp.zeros((1, 1), jnp.float32)
    )

    dt = jnp.dtype(msg_dtype)
    out = _bp_pallas_impl(
        synd_p, llr0_p, skip_p, v2c_in,
        jnp.asarray(operators["h_t"]).astype(dt),
        jnp.asarray(operators["mask"]),
        *[e.astype(dt) if dt != jnp.float32 else e for e in evs],
        method=method, max_iter=int(max_iter), it0=int(it0),
        alpha_fixed=float(ms_scaling_factor), widths=widths, slots=slots,
        m_pad=m_pad, n_pad=n_pad, block=block, resume=resume,
        emit_state=emit_state, interpret=interpret, msg_dtype=str(dt),
        vmem_limit=vmem_limit,
    )
    hard, llr, conv, iters = out[:4]

    res = (
        hard[:B_in, :n].astype(jnp.uint8),
        llr[:B_in, :n],
        conv[:B_in, 0].astype(bool),
        iters[:B_in, 0],
    )
    if emit_state:
        return res + (out[4][:B_in],)
    return res
