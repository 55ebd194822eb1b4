"""Lifted-product quantum LDPC codes (Panteleev-Kalachev construction).

Generalizes the hypergraph product from binary seed matrices to matrices
over the cyclic group algebra ``R = F2[x]/(x^L - 1)``: each protograph entry
is a set of shift exponents, expanded to an ``L x L`` sum of cyclic
permutation matrices.  For lift size ``L = 1`` this degenerates exactly to
the hypergraph product (tested against ``hgp``), while larger lifts give
the n ~ 10^4 high-rate qLDPC families that motivate the edge-sharded
decoder path (BASELINE.md row 5) — a construction the reference repo does
not provide (its largest shipped code is the [[900,36,10]] HGP).

Protograph matrices are given as nested lists of exponent tuples, e.g.
``[[(0, 1), ()], [(2,), (0,)]]``: entry (i, j) is ``sum_k x^e_k`` (empty
tuple = zero entry).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .css import css_code

__all__ = ["lifted_hgp", "circulant", "protograph_to_binary"]


def circulant(exponents, L: int) -> sp.csr_matrix:
    """Sum of cyclic shift matrices ``sum_k P^e_k`` over ``F2``, ``P`` the
    L x L left-shift permutation (``P[i, j] = 1`` iff ``j = i + 1 mod L``)."""
    M = np.zeros((L, L), dtype=np.uint8)
    for e in exponents:
        idx = np.arange(L)
        M[idx, (idx + int(e)) % L] ^= 1
    return sp.csr_matrix(M, dtype=np.uint8)


def _conj(exponents, L: int):
    """Ring conjugation x^e -> x^{-e} (transpose of the circulant)."""
    return tuple((-int(e)) % L for e in exponents)


def protograph_to_binary(proto, L: int, transpose: bool = False) -> sp.csr_matrix:
    """Expand a protograph over R to its binary lift.

    ``transpose=True`` produces the lift of the *conjugate transpose*
    (entries transposed and shift-inverted), which is the transpose of the
    plain lift.
    """
    rows = len(proto)
    cols = len(proto[0]) if rows else 0
    if transpose:
        blocks = [
            [circulant(_conj(proto[i][j], L), L) for i in range(rows)]
            for j in range(cols)
        ]
    else:
        blocks = [
            [circulant(proto[i][j], L) for j in range(cols)]
            for i in range(rows)
        ]
    return sp.bmat(blocks, format="csr", dtype=np.uint8)


class lifted_hgp(css_code):
    """Lifted (hypergraph) product of two protographs over F2[x]/(x^L-1).

    With A (ma x na) and B (mb x nb) over R::

        hx = [ A (x) I_nb  |  I_ma (x) B^T* ]
        hz = [ I_na (x) B  |  A^T* (x) I_mb ]

    where ``*`` is ring conjugation; the conjugation makes
    ``hx @ hz.T = A (x) B + A (x) B = 0`` over F2, so the result is always
    a valid CSS code.  Block length ``N = (na*nb + ma*mb) * L``.
    """

    def __init__(self, proto_a, proto_b=None, lift: int = 1,
                 compute_distance: bool = False):
        if proto_b is None:
            proto_b = proto_a
        L = int(lift)
        ma, na = len(proto_a), len(proto_a[0])
        mb, nb = len(proto_b), len(proto_b[0])
        self.lift = L
        self.proto_a = proto_a
        self.proto_b = proto_b

        def kron_proto(P, eye_n, right: bool):
            """Lift of P (x) I_eye or I_eye (x) P at the protograph level."""
            rows_p = len(P)
            cols_p = len(P[0])
            if right:  # I_eye (x) P
                out = [
                    [P[i][j] if bi == bj else ()
                     for bj in range(eye_n) for j in range(cols_p)]
                    for bi in range(eye_n) for i in range(rows_p)
                ]
            else:  # P (x) I_eye
                out = [
                    [P[i][j] if bi == bj else ()
                     for j in range(cols_p) for bj in range(eye_n)]
                    for i in range(rows_p) for bi in range(eye_n)
                ]
            return out

        # build protograph-level hx = [A x I_nb | I_ma x B^T*]
        a_kron = kron_proto(proto_a, nb, right=False)        # [ma*nb, na*nb]
        bt = [[proto_b[i][j] for i in range(mb)] for j in range(nb)]
        bt_kron = kron_proto(bt, ma, right=True)             # [ma*nb, ma*mb]
        hx_proto = [ra + rb for ra, rb in zip(a_kron, bt_kron)]
        # conjugate only the B^T block
        n_left = na * nb
        hx_proto_conj = [
            [ent if j < n_left else _conj(ent, L)
             for j, ent in enumerate(row)]
            for row in hx_proto
        ]

        # hz = [I_na x B | A^T* x I_mb]
        b_kron = kron_proto(proto_b, na, right=True)         # [na*mb, na*nb]
        at = [[proto_a[i][j] for i in range(ma)] for j in range(na)]
        at_kron = kron_proto(at, mb, right=False)            # [na*mb, ma*mb]
        hz_proto = [rb + ra for rb, ra in zip(b_kron, at_kron)]
        hz_proto_conj = [
            [ent if j < n_left else _conj(ent, L)
             for j, ent in enumerate(row)]
            for row in hz_proto
        ]

        # kept for the structure-aware decoder (decoder/lifted_bp.py):
        # the binary hx/hz are exactly the lifts of these protographs
        self.hx_proto = hx_proto_conj
        self.hz_proto = hz_proto_conj

        hx = protograph_to_binary(hx_proto_conj, L)
        hz = protograph_to_binary(hz_proto_conj, L)
        super().__init__(hx, hz)
        if compute_distance:
            self.compute_code_distance()
