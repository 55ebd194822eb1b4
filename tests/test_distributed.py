"""2-process multi-host orchestration test (CPU, subprocess launcher).

Exercises ``parallel.distributed.initialize`` + ``host_batch_slice`` +
a genuinely cross-process sharded decode with a global all-reduce
(``distributed_worker.py``).  This is the fake-multi-host harness for the
multi-host row of SURVEY.md §2.3; real pods only change the coordinator
address.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_decode():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers timed out; partial output: {outs}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
        # full BP+OSD+logical-stats phase crossed the host boundary too
        assert f"WORKER_OK2 pid={pid}" in out, out
        # the sim harness itself ran on the 2-process mesh
        assert f"WORKER_OK3 pid={pid}" in out, out
    # counters are globally reduced, so both processes must report the
    # same sim totals
    lines = [
        next(ln for ln in out.split("\n") if "WORKER_OK3" in ln)
        for out in outs
    ]
    assert lines[0].split("pid=0")[1] == lines[1].split("pid=1")[1], lines
