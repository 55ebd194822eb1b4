"""Layered (serial-schedule) belief propagation.

The reference's native decoder exposes only the flooding schedule through
its call sites, but serial/layered scheduling is the standard convergence
booster in hardware LDPC decoders (and in `ldpc` v2's ``schedule="serial"``
option): check updates within an iteration see the *current* posteriors, so
information propagates across the graph in one sweep instead of one hop —
typically halving the iterations to convergence.

TPU-native formulation: checks are greedily colored so that no two checks
in a layer share a variable, then ROWS ARE REORDERED BY LAYER at graph
build.  Each layer is a static slice of the check axis, and its
variable<->edge maps are per-layer one-hot matmul operators — the whole
sweep is a short static Python loop of MXU matmuls and VPU check updates,
with zero dynamic gathers.  Within a layer the (check, variable) pairs are
disjoint, so posterior updates cannot collide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import gf2
from .bp import BPResult, _check_update_min_sum, _check_update_product_sum, normalize_bp_method
from .tanner import TannerGraph

__all__ = ["LayeredTannerGraph", "bp_decode_layered", "color_checks"]


def color_checks(H: np.ndarray) -> list[np.ndarray]:
    """Greedy conflict coloring: checks in a layer share no variable."""
    m, n = H.shape
    supports = [frozenset(np.nonzero(H[i])[0]) for i in range(m)]
    layers: list[list[int]] = []
    layer_vars: list[set] = []
    for i in range(m):
        placed = False
        for l, used in enumerate(layer_vars):
            if not (used & supports[i]):
                layers[l].append(i)
                used.update(supports[i])
                placed = True
                break
        if not placed:
            layers.append([i])
            layer_vars.append(set(supports[i]))
    return [np.asarray(l, dtype=np.int64) for l in layers]


@jax.tree_util.register_pytree_node_class
class LayeredTannerGraph(TannerGraph):
    """Tanner graph with checks reordered into conflict-free layers.

    ``row_perm`` maps original check ids to the layered order; syndromes
    must be permuted with it (``bp_decode_layered`` does this internally).
    Adds per-layer one-hot operators ``layer_ops[l] [mlc_l * wr, n]``.
    """

    def __init__(self, H):
        Hd = gf2.to_dense(H)
        layers = color_checks(Hd)
        row_perm = np.concatenate(layers)
        super().__init__(Hd[row_perm])
        self.row_perm = row_perm
        sizes = [len(l) for l in layers]
        self.layer_bounds = tuple(
            (int(sum(sizes[:i])), int(sum(sizes[: i + 1])))
            for i in range(len(sizes))
        )
        ops = []
        for lo, hi in self.layer_bounds:
            mlc = hi - lo
            M = np.zeros((mlc * self.wr, self.n), dtype=np.float32)
            rows, slots = np.nonzero(self.chk_mask[lo:hi])
            cols = self.chk_var[lo:hi][rows, slots]
            M[rows * self.wr + slots, cols] = 1.0
            ops.append(M)
        self.layer_ops = tuple(ops)

    _LEAF_FIELDS = TannerGraph._LEAF_FIELDS + ("layer_ops", "row_perm")
    _AUX_FIELDS = TannerGraph._AUX_FIELDS + ("layer_bounds",)


def bp_decode_layered(
    graph: LayeredTannerGraph,
    syndromes,
    llr0,
    *,
    bp_method: str = "minimum_sum",
    max_iter: int = 0,
    ms_scaling_factor: float = 0.625,
) -> BPResult:
    """Layered-schedule BP; same result contract as ``bp_decode``.

    Outputs (hard decisions, posteriors, convergence) are in the ORIGINAL
    check/variable indexing — the internal row permutation is hidden.
    """
    method = normalize_bp_method(bp_method)
    if max_iter == 0:
        max_iter = graph.n
    m, n, wr = graph.m, graph.n, graph.wr
    bounds = graph.layer_bounds
    L = len(bounds)

    syndromes = jnp.asarray(syndromes)
    if syndromes.ndim == 1:
        syndromes = syndromes[None, :]
    B = syndromes.shape[0]
    row_perm = jnp.asarray(graph.row_perm)
    synd = jnp.take(syndromes.astype(jnp.int32), row_perm, axis=1)
    syn_sign = (1.0 - 2.0 * synd.astype(jnp.float32))[:, :, None]

    llr0 = jnp.broadcast_to(jnp.asarray(llr0, jnp.float32), (B, n))

    chk_mask = jnp.asarray(graph.chk_mask)
    fixed_alpha = float(ms_scaling_factor)
    adaptive = method == "minimum_sum" and fixed_alpha == 0.0

    def sweep(totals, c2v, it):
        """One full layered iteration: L static-layer updates."""
        for l in range(L):
            lo, hi = bounds[l]
            mlc = hi - lo
            M = graph.layer_ops[l]  # [mlc*wr, n]
            c2v_l = jax.lax.slice_in_dim(c2v, lo, hi, axis=1)
            v2c_l = (
                jnp.einsum(
                    "bn,en->be", totals, M, preferred_element_type=jnp.float32
                ).reshape(B, mlc, wr)
                - c2v_l
            )
            mask_l = jax.lax.slice_in_dim(chk_mask, lo, hi, axis=0)
            sign_l = jax.lax.slice_in_dim(syn_sign, lo, hi, axis=1)
            if method == "minimum_sum":
                alpha = (
                    1.0 - jnp.exp2(-it.astype(jnp.float32))
                    if adaptive
                    else fixed_alpha
                )
                c2v_new = _check_update_min_sum(v2c_l, mask_l, sign_l, alpha)
            else:
                c2v_new = _check_update_product_sum(v2c_l, mask_l, sign_l)
            c2v_new = jnp.where(mask_l, c2v_new, 0.0)
            delta = c2v_new - jnp.where(mask_l, c2v_l, 0.0)
            totals = totals + jnp.einsum(
                "be,en->bn",
                delta.reshape(B, mlc * wr),
                M,
                preferred_element_type=jnp.float32,
            )
            c2v = jax.lax.dynamic_update_slice_in_dim(c2v, c2v_new, lo, axis=1)
        return totals, c2v

    full_op = jnp.concatenate([jnp.asarray(op) for op in graph.layer_ops], axis=0)

    def syndrome_check(hard):
        bits = jnp.einsum(
            "bn,en->be", hard.astype(jnp.float32), full_op,
            preferred_element_type=jnp.float32,
        ).reshape(B, m, wr)
        synd_hat = jnp.sum(bits, axis=-1).astype(jnp.int32) & 1
        return jnp.all(synd_hat == synd, axis=-1)

    def body(state):
        it, totals, c2v, hard_out, llr_out, iters, conv = state
        totals, c2v = sweep(totals, c2v, it)
        hard = (totals <= 0).astype(jnp.int32)
        ok = syndrome_check(hard)
        live = ~conv
        hard_out = jnp.where(live[:, None], hard, hard_out)
        llr_out = jnp.where(live[:, None], totals, llr_out)
        iters = jnp.where(live, it, iters)
        conv = conv | ok
        return it + 1, totals, c2v, hard_out, llr_out, iters, conv

    def cond(state):
        it, _, _, _, _, _, conv = state
        return (it <= max_iter) & ~jnp.all(conv)

    init = (
        jnp.int32(1),
        llr0,
        jnp.zeros((B, m, wr), jnp.float32),
        jnp.zeros((B, n), jnp.int32),
        llr0,
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
    )
    _, _, _, hard_out, llr_out, iters, conv = jax.lax.while_loop(
        cond, body, init
    )
    return BPResult(
        hard=hard_out.astype(jnp.uint8),
        llr=llr_out,
        converged=conv,
        iterations=iters,
    )
