"""Hypergraph-product (HGP) quantum LDPC code construction.

TPU-framework counterpart of the reference ``hgp``/``hgp_single`` classes
(reference ``src/bposd/hgp.py:8-94``).  Given classical seed parity-check
matrices ``h1 (m1 x n1)`` and ``h2 (m2 x n2)``::

    hx = [ h1 (x) I_n2  |  I_m1 (x) h2^T ]      (reference hgp.py:48-50)
    hz = [ I_n1 (x) h2  |  h1^T (x) I_m2 ]      (reference hgp.py:52-54)

yielding a CSS code with ``N = n1 n2 + m1 m2`` and
``K = k1 k2 + k1t k2t`` where ``k = n - rank(h)`` and ``kt = m - rank(h)``
(reference ``hgp.py:29-44``).  The code distance is
``min(d1, d1t, d2, d2t)`` over the seed codes and their transposes when the
seeds have full-rank complements (reference ``hgp.py:60-81``).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .. import gf2
from .code_util import compute_exact_code_distance
from .css import css_code

__all__ = ["hgp", "hgp_single"]


class hgp(css_code):
    def __init__(self, h1, h2=None, compute_distance: bool = False):
        super().__init__()

        h1 = h1 if sp.issparse(h1) else sp.csr_matrix(np.asarray(h1))
        h1 = h1.tocsr().astype(np.uint8)
        h2 = h1.copy() if h2 is None else h2
        h2 = h2 if sp.issparse(h2) else sp.csr_matrix(np.asarray(h2))
        h2 = h2.tocsr().astype(np.uint8)

        self.h1, self.h2 = h1, h2

        # seed code parameters
        self.m1, self.n1 = h1.shape
        self.m2, self.n2 = h2.shape
        self.r1 = gf2.rank(h1)
        self.r2 = gf2.rank(h2)
        self.k1 = self.n1 - self.r1
        self.k1t = self.m1 - self.r1
        self.k2 = self.n2 - self.r2
        self.k2t = self.m2 - self.r2

        # hgp block length and dimension
        self.N = self.n1 * self.n2 + self.m1 * self.m2
        self.K = self.k1 * self.k2 + self.k1t * self.k2t

        i_m1 = sp.identity(self.m1, format="csr", dtype=np.uint8)
        i_n1 = sp.identity(self.n1, format="csr", dtype=np.uint8)
        i_m2 = sp.identity(self.m2, format="csr", dtype=np.uint8)
        i_n2 = sp.identity(self.n2, format="csr", dtype=np.uint8)

        self.hx1 = sp.kron(h1, i_n2, format="csr").astype(np.uint8)
        self.hx2 = sp.kron(i_m1, h2.T, format="csr").astype(np.uint8)
        self.hx = sp.hstack([self.hx1, self.hx2], format="csr").astype(np.uint8)

        self.hz1 = sp.kron(i_n1, h2, format="csr").astype(np.uint8)
        self.hz2 = sp.kron(h1.T, i_m2, format="csr").astype(np.uint8)
        self.hz = sp.hstack([self.hz1, self.hz2], format="csr").astype(np.uint8)

        self.compute_logicals()
        self.compute_column_row_weights()

        if compute_distance:
            self.d1 = (
                compute_exact_code_distance(self.h1)
                if self.n1 != self.r1
                else np.inf
            )
            self.d2 = (
                compute_exact_code_distance(self.h2)
                if self.n2 != self.r2
                else np.inf
            )
            self.d1t = (
                compute_exact_code_distance(self.h1.T)
                if self.m1 != self.r1
                else np.inf
            )
            self.d2t = (
                compute_exact_code_distance(self.h2.T)
                if self.m2 != self.r2
                else np.inf
            )
            self.D = int(np.min([self.d1, self.d1t, self.d2, self.d2t]))
        else:
            self.D = None

    def print_code_parameters(self):
        if self.D is None:
            print(f"[[{self.N},{self.K},d]]")
        else:
            print(f"[[{self.N},{self.K},{self.D}]]")


class hgp_single(hgp):
    """Symmetric hypergraph product of a single seed code with itself."""

    def __init__(self, h1, compute_distance: bool = False):
        super().__init__(h1, compute_distance=compute_distance)
