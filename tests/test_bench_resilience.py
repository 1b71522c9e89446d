"""bench.py resilience: a driver round must NEVER end with rc=1 and no
JSON record.  Round-2's scoreboard entry was erased by a transient axon
tunnel outage ("Unable to initialize backend 'axon': UNAVAILABLE") because
the bench crashed on first device contact; these tests pin the recovery
behavior: bounded probe + CPU-fallback degraded record + crash-proof emit.
"""

import io
import json
import os
import subprocess
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _last_json_line(text):
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    assert lines, f"no output: {text!r}"
    return json.loads(lines[-1])


def test_probe_forced_failure(monkeypatch):
    monkeypatch.setenv("BENCH_FORCE_BACKEND_FAIL", "1")
    ok, err = bench.probe_backend()
    assert not ok
    assert "forced failure" in err


def test_emit_on_bench_crash(monkeypatch):
    """Even if the measurement itself raises, main() prints a parseable
    JSON line and does not propagate the exception."""
    monkeypatch.setenv("BENCH_FORCE_BACKEND_FAIL", "1")

    def boom(warm_s, meas_s):
        raise RuntimeError("synthetic measurement failure")

    monkeypatch.setattr(bench, "run_pipeline_bench", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    rec = _last_json_line(buf.getvalue())
    assert rec["metric"] == "pipeline_sensor_sec_per_sec"
    assert rec["value"] == 0.0
    assert rec["degraded"] is True
    assert "synthetic measurement failure" in rec["error"]


def test_emit_degraded_record(monkeypatch):
    """Backend down + measurement ok → degraded record with the value."""
    monkeypatch.setenv("BENCH_FORCE_BACKEND_FAIL", "1")
    monkeypatch.setattr(
        bench, "run_pipeline_bench",
        lambda warm_s, meas_s: {"value": 0.123,
                                "stage_busy": {"frontend": 1.0}})
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    rec = _last_json_line(buf.getvalue())
    assert rec["value"] == 0.123
    assert rec["degraded"] is True
    assert rec["backend"] == "cpu-fallback"
    assert rec["stage_busy_s"] == {"frontend": 1.0}


def test_emit_healthy_record(monkeypatch):
    """Healthy backend → clean record, no degraded tag."""
    monkeypatch.setattr(bench, "probe_backend", lambda: (True, ""))
    monkeypatch.setattr(
        bench, "run_pipeline_bench",
        lambda warm_s, meas_s: {"value": 0.5, "stage_busy": {}})
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    rec = _last_json_line(buf.getvalue())
    assert rec["value"] == 0.5
    assert "degraded" not in rec
    assert rec["backend"] == "default"


@pytest.mark.slow
def test_degraded_cpu_run_end_to_end(tmp_path):
    """Full subprocess run with the backend forced down: the CPU-fallback
    pipeline must produce a real (non-zero) sensor-sec/s number."""
    env = dict(os.environ)
    env.update(BENCH_FORCE_BACKEND_FAIL="1",
               BENCH_DEGRADED_WARM_S="2.5",
               BENCH_DEGRADED_MEAS_S="2.0",
               BENCH_SETTLE_S="2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                       capture_output=True, text=True, env=env,
                       timeout=1800, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["degraded"] is True
    assert rec["value"] > 0.0, rec
