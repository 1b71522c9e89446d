"""Multi-process bring-up: the `parallel.distributed` helper actually runs.

Covers VERDICT round-1 item 8b — `distributed.py` had never been executed.
Two real OS processes (gloo CPU collectives) form a 4-device global mesh
and psum across the process boundary, the minimal analog of the reference's
"config 5" multi-host deployment (BASELINE.json north star).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_smoke_single_process():
    """In-process smoke over the 8 virtual devices (was dead code)."""
    from mvil_fusion_tpu.parallel import distributed
    assert distributed.smoke() == 8
    assert distributed.smoke(4) == 4


@pytest.mark.slow
def test_two_process_allreduce():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mvil_fusion_tpu.parallel.distributed",
             f"--coordinator=localhost:{port}", "--num-processes=2",
             f"--process-id={pid}", "--platform=cpu"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process smoke timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "4 global devices" in out, out
        assert "allreduce smoke over 4 devices OK" in out, out
