"""Bit-for-bit decode parity against the real `ldpc` package.

The reference delegates all decoding to the external `ldpc` C++/Cython
package (reference ``setup.py:30``).  `ldpc` cannot be installed in this
environment (no network; see BASELINE.md), so this harness SKIPS cleanly
here — but it is ready to run anywhere `ldpc>=2.0` IS installed:

    pip install ldpc && python -m pytest tests/test_parity_vs_ldpc.py -v

It asserts bit-for-bit equality of ``bposd_decoder`` decodings on the
BASELINE.json configs.  The tie-breaking conventions parity depends on are
documented in PARITY.md ("Tie-breaking conventions"); if a future `ldpc`
version resolves ties differently, the *validity* and *weight* assertions
localize the divergence to tie order rather than decoder logic.
"""

import numpy as np
import pytest

ldpc = pytest.importorskip("ldpc", reason="ldpc not installed (expected here)")

from bp_osd_tpu.codes import hamming_code, hgp, mkmn_16_4_6, rep_code
from bp_osd_tpu.decoder import BpOsdDecoder


def _ldpc_decoder(H, **kw):
    try:  # ldpc v2 class name
        from ldpc import BpOsdDecoder as LdpcDecoder

        return LdpcDecoder(H, **kw)
    except ImportError:  # pragma: no cover - ldpc v1
        from ldpc import bposd_decoder as LdpcDecoder

        return LdpcDecoder(H, **kw)


CASES = [
    # (name, H builder, p, bp_method, ms_sf, osd_method, osd_order, B)
    ("surface_osd0", lambda: hgp(rep_code(3), rep_code(3)).hx, 0.05,
     "ms", 0.625, "osd0", 0, 256),
    ("steane_ps_osde", lambda: hamming_code(3), 0.10,
     "ps", 0.625, "osd_e", 7, 256),
    ("flagship_ms0_osdcs", lambda: hgp(mkmn_16_4_6()).hx, 0.05,
     "ms", 0.0, "osd_cs", 42, 128),
]


@pytest.mark.parametrize("name,Hb,p,bpm,sf,osdm,order,B",
                         CASES, ids=[c[0] for c in CASES])
def test_bit_for_bit_vs_ldpc(name, Hb, p, bpm, sf, osdm, order, B):
    H = np.asarray(Hb().toarray() if hasattr(Hb(), "toarray") else Hb(),
                   np.uint8)
    m, n = H.shape
    rng = np.random.default_rng(1234)
    errors = (rng.random((B, n)) < p).astype(np.uint8)
    synds = (errors @ H.T % 2).astype(np.uint8)

    ref = _ldpc_decoder(
        H, error_rate=float(p), bp_method=bpm, max_iter=n,
        ms_scaling_factor=float(sf), osd_method=osdm, osd_order=int(order),
    )
    ours = BpOsdDecoder(
        H, error_rate=float(p), bp_method=bpm, max_iter=n,
        ms_scaling_factor=float(sf), osd_method=osdm, osd_order=int(order),
    )

    mismatch = []
    for i, s in enumerate(synds):
        ref_dec = np.asarray(ref.decode(s)).astype(np.uint8)
        ours.decode(s)
        our_dec = np.asarray(ours.osdw_decoding).astype(np.uint8)
        # hard invariants first: both must satisfy the syndrome
        assert ((ref_dec @ H.T % 2) == s).all()
        assert ((our_dec @ H.T % 2) == s).all()
        if not (ref_dec == our_dec).all():
            mismatch.append((i, int(ref_dec.sum()), int(our_dec.sum())))
    assert not mismatch, (
        f"{len(mismatch)}/{B} decodings differ from ldpc "
        f"(first few (idx, w_ldpc, w_ours): {mismatch[:5]}); "
        "if weights are equal the divergence is tie-order — see PARITY.md"
    )
