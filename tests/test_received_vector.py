"""Received-vector decoding mode (ldpc ctor surface, SURVEY.md section 2.2).

``input_vector_type="received_vector"``: decode() takes a noisy length-n
word, the syndrome is H @ w mod 2, and the returned decoding is the
estimated codeword ``w XOR e_hat`` (classical-LDPC semantics).
"""

import numpy as np
import pytest

from bp_osd_tpu import BpOsdDecoder, bposd_decoder
from bp_osd_tpu.codes import hamming_code, rep_code
from bp_osd_tpu.decoder import BpDecoder
from bp_osd_tpu.gf2 import nullspace


def _dense(M):
    return np.asarray(M.toarray() if hasattr(M, "toarray") else M, np.uint8)


def _codeword(H, idx=0):
    ns = nullspace(H)
    ns = ns.toarray() if hasattr(ns, "toarray") else np.asarray(ns)
    return ns[idx].astype(np.uint8)


def test_received_vector_roundtrips_single_bit_errors_rep_code():
    """rep_code(5) has a cycle-free Tanner graph: BP is exact, so every
    single-bit error decodes back to the transmitted codeword."""
    H = _dense(rep_code(5))
    n = H.shape[1]
    cw = _codeword(H)  # the all-ones word
    bpd = BpOsdDecoder(
        H, error_rate=0.05, max_iter=n, bp_method="ps",
        osd_method="osd_e", osd_order=1,
        input_vector_type="received_vector",
    )
    for flip in range(n):
        received = cw.copy()
        received[flip] ^= 1
        out = bpd.decode(received)
        assert np.array_equal((H @ out) % 2, np.zeros(H.shape[0]))
        assert np.array_equal(out, cw), f"bit {flip} not corrected"


def test_received_vector_equals_syndrome_mode_xor_received():
    """Mode contract: received-vector decoding == syndrome decoding of
    H @ w with the estimate XORed into w, for bp/osd0/osdw outputs."""
    H = _dense(hamming_code(3))
    n = H.shape[1]
    rng = np.random.default_rng(11)
    received = (rng.random((8, n)) < 0.3).astype(np.uint8)

    kw = dict(error_rate=0.05, max_iter=n, bp_method="ms",
              ms_scaling_factor=0.625, osd_method="osd_cs", osd_order=3)
    rv = BpOsdDecoder(H, input_vector_type="received_vector", **kw)
    sy = BpOsdDecoder(H, **kw)

    rv.decode_batch(received)
    sy.decode_batch((received @ H.T) % 2)

    assert np.array_equal(rv.osdw_decoding_batch,
                          sy.osdw_decoding_batch ^ received)
    assert np.array_equal(rv.osd0_decoding_batch,
                          sy.osd0_decoding_batch ^ received)
    assert np.array_equal(rv.bp_decoding_batch,
                          sy.bp_decoding_batch ^ received)
    assert np.array_equal(rv.converge_batch, sy.converge_batch)
    # every returned decoding is a valid codeword
    assert not ((rv.osdw_decoding_batch @ H.T) % 2).any()


def test_received_vector_bp_only_decoder():
    H = _dense(rep_code(5))
    cw = _codeword(H)
    received = cw.copy()
    received[2] ^= 1
    bp_only = BpDecoder(
        H, error_rate=0.05, max_iter=10, bp_method="ps",
        input_vector_type="received_vector",
    )
    out = bp_only.decode(received)
    assert np.array_equal(out, cw)


def test_syndrome_mode_unchanged_and_bad_mode_rejected():
    H = _dense(hamming_code(3))
    with pytest.raises(NotImplementedError):
        BpOsdDecoder(H, error_rate=0.05, input_vector_type="banana")
    bpd = bposd_decoder(H, error_rate=0.05, max_iter=7, bp_method="ps",
                        osd_method="osd0")
    e = np.zeros(7, np.uint8)
    e[3] = 1
    out = bpd.decode((H @ e) % 2)
    assert np.array_equal(out, e)
