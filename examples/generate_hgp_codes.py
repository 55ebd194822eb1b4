"""Generate and save the hypergraph-product benchmark code family
(counterpart of reference ``examples/codes/hgp_codes/generate_codes.py``):
builds HGP codes from MKMN-style classical seeds, canonicalizes the
logicals, validates, and saves the matrices as text files.
"""

import os

import numpy as np

from bp_osd_tpu.codes import hgp, mkmn_16_4_6

OUT_DIR = os.path.join(os.path.dirname(__file__), "codes", "hgp_codes")


def generate(seed_matrix, out_dir=OUT_DIR):
    os.makedirs(out_dir, exist_ok=True)
    qcode = hgp(seed_matrix, compute_distance=True)
    qcode.canonical_logicals()
    assert qcode.test(show_tests=False)
    stem = os.path.join(out_dir, f"hgp_{qcode.code_params}")
    np.savetxt(f"{stem}_hx.txt", qcode.hx.toarray(), fmt="%d")
    np.savetxt(f"{stem}_hz.txt", qcode.hz.toarray(), fmt="%d")
    np.savetxt(f"{stem}_lx.txt", qcode.lx.toarray(), fmt="%d")
    np.savetxt(f"{stem}_lz.txt", qcode.lz.toarray(), fmt="%d")
    print(f"saved {qcode.code_params} to {out_dir}")
    return qcode


if __name__ == "__main__":
    generate(mkmn_16_4_6())
