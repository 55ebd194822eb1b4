"""Classical binary code generators.

TPU-framework replacement for ``ldpc.codes`` as consumed by the reference
(``rep_code`` at reference ``tests/test_hgp.py:10``, ``hamming_code`` at
reference ``tests/test_css.py:9``).  These are tiny host-side constructors;
they feed the hypergraph-product construction and the test-suite.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["rep_code", "ring_code", "hamming_code", "mkmn_16_4_6"]


def rep_code(distance: int) -> sp.csr_matrix:
    """Parity-check matrix of the length-``distance`` repetition code.

    ``(distance-1) x distance`` chain: row i checks bits i and i+1.
    """
    if distance < 2:
        raise ValueError("repetition code requires distance >= 2")
    m = distance - 1
    rows = np.repeat(np.arange(m), 2)
    cols = np.empty(2 * m, dtype=np.int64)
    cols[0::2] = np.arange(m)
    cols[1::2] = np.arange(m) + 1
    data = np.ones(2 * m, dtype=np.uint8)
    return sp.csr_matrix((data, (rows, cols)), shape=(m, distance), dtype=np.uint8)


def ring_code(distance: int) -> sp.csr_matrix:
    """Closed-loop (cyclic) repetition code: ``distance x distance`` circulant."""
    if distance < 2:
        raise ValueError("ring code requires distance >= 2")
    n = distance
    rows = np.repeat(np.arange(n), 2)
    cols = np.empty(2 * n, dtype=np.int64)
    cols[0::2] = np.arange(n)
    cols[1::2] = (np.arange(n) + 1) % n
    data = np.ones(2 * n, dtype=np.uint8)
    return sp.csr_matrix((data, (rows, cols)), shape=(n, n), dtype=np.uint8)


def hamming_code(rank: int) -> sp.csr_matrix:
    """[2^rank - 1, 2^rank - 1 - rank, 3] Hamming code parity-check matrix.

    Column j is the ``rank``-bit binary expansion of j+1, most significant bit
    in row 0 — the layout whose rank-3 instance appears verbatim in the
    reference README (reference ``README.md:65-74``).
    """
    if rank < 2:
        raise ValueError("hamming code requires rank >= 2")
    n = (1 << rank) - 1
    j = np.arange(1, n + 1)
    i = np.arange(rank).reshape(-1, 1)
    H = ((j >> (rank - 1 - i)) & 1).astype(np.uint8)
    return sp.csr_matrix(H, dtype=np.uint8)


# The (3,4)-regular [16,4,6] MacKay-Neal style seed matrix shipped with the
# reference as ``examples/codes/classical_seed_codes/mkmn_16_4_6.txt`` — the
# seed of the flagship [[400,16,6]] hypergraph-product benchmark code
# (reference ``examples/qldpc_decode_example.py:5``).  Stored as data so the
# benchmark is self-contained.
_MKMN_16_4_6_ROWS = (
    0b0000000000110011,
    0b0001000011000100,
    0b0010000001011000,
    0b1000001100100000,
    0b0000100110000010,
    0b0111000100000000,
    0b1010000010000001,
    0b0001010000101000,
    0b1000100000001100,
    0b0000111000010000,
    0b0100010001000010,
    0b0100001000000101,
)


def mkmn_16_4_6() -> sp.csr_matrix:
    """The 12x16 MKMN seed code of the [[400,16,6]] benchmark HGP code."""
    H = np.array(
        [[(r >> c) & 1 for c in range(16)] for r in _MKMN_16_4_6_ROWS],
        dtype=np.uint8,
    )
    return sp.csr_matrix(H, dtype=np.uint8)
