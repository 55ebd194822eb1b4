"""Measure the serial-CPU reference baseline and record it.

Builds ``bp_osd_tpu/native/cpu_baseline.cpp`` (a serial BP+OSD with the
reference's decode semantics — see its header comment), runs it on the
flagship [[400,16,6]] workload (reference ``examples/qldpc_decode_example.py:
8-23``: p=0.05, min-sum with adaptive scaling, max_iter=0 -> N, osd_cs
order 42, one syndrome per decode), and writes the measured number to
``BASELINE_MEASURED.json`` — the figure ``bench.py`` uses for
``vs_baseline`` instead of the round-1 estimate.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(ROOT, "bp_osd_tpu", "native", "cpu_baseline.cpp")
OUT = os.path.join(ROOT, "BASELINE_MEASURED.json")


def main():
    from bp_osd_tpu.codes import hgp, mkmn_16_4_6

    qcode = hgp(mkmn_16_4_6())
    hx = np.asarray(qcode.hx.toarray(), np.uint8)
    m, n = hx.shape

    with tempfile.TemporaryDirectory() as tmp:
        hpath = os.path.join(tmp, "H.txt")
        with open(hpath, "w") as f:
            f.write(f"{m} {n}\n")
            for row in hx:
                f.write("".join("1" if v else "0" for v in row) + "\n")
        binpath = os.path.join(tmp, "cpu_baseline")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-o", binpath, SRC],
            check=True,
        )
        num = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
        t0 = time.time()
        res = subprocess.run(
            [binpath, hpath, "0.05", str(num), "0", "42"],
            check=True,
            capture_output=True,
            text=True,
        )
        rec = json.loads(res.stdout)

    rec.update(
        {
            "workload": "[[400,16,6]] MKMN HGP, p=0.05, ms adaptive, "
            "max_iter=0->400, osd_cs order 42, serial 1 syndrome/decode",
            "cpu": open("/proc/cpuinfo").read().split("model name\t: ")[1].split("\n")[0],
            "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "wall_s": round(time.time() - t0, 1),
        }
    )
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
