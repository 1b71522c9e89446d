"""Benchmark: whole-pipeline sensor throughput on one chip.

Drives the COMPLETE system — KLT tracker on rendered 640x480 images at
30 Hz, 200 Hz IMU, 10 Hz 16-ring sweeps (>=900 azimuth steps), VIO window
BA with lidar constraints, LOAM scan-to-map, global pose graph — through
the threaded 3-stage pipeline (pipeline/async_system.py), and reports how
many seconds of sensor data the system absorbs per wall-clock second.

Baseline: 1.0 — the reference's operational envelope is sustaining exactly
real time on these sensor rates on a desktop CPU (BASELINE.md; reference
README.md:18-20 rates, mynteye_leishen_indoor.yaml).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Per-kernel device numbers live in benchmarks/kernels.py; the bare fused
BA-step rate (round-1 metric) in benchmarks/frame_step.py.
"""

import faulthandler
import json
import os
import signal
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))

VERBOSE = os.environ.get("BENCH_VERBOSE", "") == "1"


def _log(msg):
    if VERBOSE:
        print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}",
              file=sys.stderr, flush=True)


_T0 = time.perf_counter()
faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps all stacks

WARM_S = float(os.environ.get("BENCH_WARM_S", "4.0"))  # init + compiles
MEAS_S = float(os.environ.get("BENCH_MEAS_S", "24.0"))
IMU_HZ, IMG_HZ, LIDAR_HZ = 200.0, 30.0, 10.0
BASELINE_SENSOR_SEC_PER_SEC = 1.0

# Backend bring-up resilience: the axon tunnel can be down/wedged for
# minutes ("Unable to initialize backend 'axon': UNAVAILABLE", or
# jax.devices() hanging >10 min).  The round must still record a number,
# so first PROBE the backend in a disposable subprocess with a timeout,
# retrying with backoff; only a healthy probe lets the in-process bench
# touch the default backend.  On persistent failure fall back to the
# in-process CPU backend and tag the record as degraded.
PROBE_BUDGET_S = float(os.environ.get("BENCH_PROBE_BUDGET_S", "900"))
PROBE_TIMEOUT_S = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "180"))

_PROBE_SRC = (
    "import jax, numpy as np\n"
    "d = jax.devices()\n"
    "x = np.asarray(jax.numpy.ones((8, 8)) * 2.0)\n"
    "assert float(x.sum()) == 128.0\n"
    "print('PROBE_OK', d[0].platform)\n"
)


def probe_backend() -> tuple[bool, str]:
    """Try to bring up the default JAX backend in a subprocess, retrying
    with backoff for up to PROBE_BUDGET_S.  Returns (ok, last_error)."""
    if os.environ.get("BENCH_FORCE_BACKEND_FAIL", "") == "1":
        return False, "forced failure (BENCH_FORCE_BACKEND_FAIL=1)"
    deadline = time.monotonic() + PROBE_BUDGET_S
    delay, last_err = 15.0, "no probe attempted"
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.monotonic()
        if budget <= 0:
            return False, last_err
        _log(f"backend probe attempt {attempt} "
             f"(timeout {min(PROBE_TIMEOUT_S, budget):.0f}s)")
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True,
                timeout=min(PROBE_TIMEOUT_S, max(budget, 10.0)))
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                _log(f"backend probe ok: {r.stdout.strip()}")
                return True, ""
            last_err = (r.stderr.strip().splitlines() or ["rc=%d" % r.returncode])[-1]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {PROBE_TIMEOUT_S:.0f}s"
        _log(f"probe failed: {last_err}")
        if time.monotonic() + delay > deadline:
            return False, last_err
        time.sleep(delay)
        delay = min(delay * 2, 240.0)


def build_stream(duration: float):
    """Reference-scale in-memory sensor stream (messages as io.rosbag.play
    yields them); generation cost is excluded from the timed window."""
    import numpy as np
    from mvil_fusion_tpu.io.fixture import surface_reflectivity
    from mvil_fusion_tpu.io.synthetic import (SyntheticTrajectory,
                                              SyntheticWorld)
    from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep

    rng = np.random.default_rng(0)
    traj = SyntheticTrajectory(duration=duration + 1.0,
                               w_amp=(0.45, 0.4, 0.5),
                               w_freq=(0.37, 0.29, 0.43),
                               p_amp=(1.3, 1.1, 0.4),
                               p_freq=(0.31, 0.37, 0.21))
    world = SyntheticWorld(traj=traj, n_landmarks=600, landmark_radius=8.0)
    box = BoxWorld()
    ric, tic = np.eye(3), np.zeros(3)

    msgs = []
    acc, gyr, _, ts = traj.imu_sequence(0.0, duration, IMU_HZ,
                                        noise_acc=0.02, noise_gyr=0.004,
                                        rng=rng)
    for k in range(len(ts)):
        msgs.append(("imu", ts[k], (acc[k], gyr[k])))
    for t in np.arange(0.2, duration, 1.0 / IMG_HZ):
        img = world.render_image(t, ric, tic, fx=460.0, fy=460.0,
                                 cx=320.0, cy=240.0, width=640, height=480)
        msgs.append(("image", t, (img,)))
    scan_period = 1.0 / LIDAR_HZ
    for t in np.arange(0.25, duration - scan_period,
                                        scan_period):
        s = simulate_sweep(box, traj, t, scan_period=scan_period,
                           n_azimuth=900, rng=rng, noise=0.01)
        inten = surface_reflectivity(s["pts_world"])
        inten = np.where(s["mask"], inten, 0.0).astype(np.float32)
        pts = np.where(s["mask"][:, None], s["pts"], 0.0)
        msgs.append(("lidar", t, ({"pts": pts, "intensity": inten},)))
    msgs.sort(key=lambda m: m[1])
    return msgs


def run_pipeline_bench(warm_s: float, meas_s: float,
                       precompile_only: bool = False) -> dict:
    """The actual measurement: drive the full system through the threaded
    pipeline; returns {"value", "stage_busy", "latency_ms", ...}.  Assumes
    the JAX backend is already decided (default or forced-CPU).

    precompile_only: run the warm segment and exit (no timed segment) —
    used by the throwaway subprocess that populates the tunnel server's
    compile cache (see precompile_in_subprocess)."""
    from mvil_fusion_tpu.io.fixture import fixture_config
    from mvil_fusion_tpu.pipeline.async_system import build_pipeline
    from mvil_fusion_tpu.pipeline.system import VilSystem

    cfg = fixture_config()
    system = VilSystem(cfg, use_tracker=True, enable_mapping=True)
    # real-time solver budget (reference ceres 0.05 s cap,
    # estimator.cpp:1400-1414) — active in the production threaded path
    system.estimator.enforce_budget = True
    _log("building sensor stream")
    msgs = build_stream(warm_s + meas_s)
    warm = [m for m in msgs if m[1] < warm_s]
    meas = [m for m in msgs if m[1] >= warm_s]
    _log(f"stream ready: {len(warm)} warm + {len(meas)} timed msgs")

    pipe = build_pipeline(system, deterministic=False)

    # per-event latency percentiles by kind (VERDICT r3 task 6)
    from collections import defaultdict
    lat = defaultdict(list)
    recording = [False]

    def _wrap(fn):
        def wrapped(msg):
            t0 = time.perf_counter()
            out = fn(msg)
            if recording[0]:
                lat[msg[0]].append(time.perf_counter() - t0)
            return out
        return wrapped

    for st in pipe.stages:
        st.fn = _wrap(st.fn)

    pipe.start()
    try:
        for i, m in enumerate(warm):
            kind, t, payload = m
            if kind == "lidar":
                (fields,) = payload
                payload = (fields["pts"], fields.get("intensity"))
            pipe.feed((kind, t, payload))
            if VERBOSE and i % 200 == 0:
                _log(f"warm feed {i}/{len(warm)}")
        _log("warm fed; quiescing")
        assert pipe.quiesce(timeout=1800.0), "warmup did not quiesce"
        _log(f"warm done; estimator status={system.estimator.status} "
             f"frames={len(system.frontend_trajectory())}")
        if precompile_only:
            # force-compile the adaptive-budget iteration variants so the
            # measuring process never cache-misses when the solver budget
            # halves the LM iteration count mid-run
            try:
                system.estimator.precompile_iter_variants()
                _log("iter variants precompiled")
            except Exception as e:  # noqa: BLE001
                _log(f"iter-variant precompile skipped: {e!r}")
            # ...and the rare-event mapping programs (loop detection /
            # verification, pose-graph solve): the first loop closure
            # otherwise pays a mid-run tunnel compile (14 s at r5)
            try:
                if system.global_mapper is not None:
                    system.global_mapper.precompile_event_paths()
                    _log("mapping event paths precompiled")
            except Exception as e:  # noqa: BLE001
                _log(f"mapping event-path precompile skipped: {e!r}")
            return {"value": 0.0, "stage_busy": {}}
        # small settle: with the compile cache pre-populated by the
        # precompile subprocess there are no multi-minute background
        # compiles left to drain (was 90 s in round 3)
        settle = float(os.environ.get("BENCH_SETTLE_S", "10"))
        time.sleep(settle)
        _log(f"settled {settle:.0f}s")

        recording[0] = True
        base_busy = {st.name: st.busy_s for st in pipe.stages}
        t0 = time.perf_counter()
        for m in meas:
            kind, t, payload = m
            if kind == "lidar":
                (fields,) = payload
                payload = (fields["pts"], fields.get("intensity"))
            pipe.feed((kind, t, payload))
        _log("timed fed; quiescing")
        assert pipe.quiesce(timeout=1800.0), "measurement did not quiesce"
        wall = time.perf_counter() - t0
        recording[0] = False
        _log(f"timed done in {wall:.1f}s; stage busy during timed segment: "
             + ", ".join(
                 f"{st.name}={st.busy_s - base_busy[st.name]:.1f}s"
                 f"(n={st.processed})" for st in pipe.stages))
    finally:
        pipe.stop(timeout=120.0)
        for _pool in (getattr(pipe, "upload_pool", None),
                      getattr(pipe, "lidar_pool", None)):
            if _pool is not None:
                _pool.shutdown(wait=False)

    for st in pipe.stages:
        if st.errors:
            raise RuntimeError(f"stage {st.name}:\n" + st.errors[0])
    span = meas[-1][1] - meas[0][1]
    busy = {st.name: round(st.busy_s - base_busy[st.name], 2)
            for st in pipe.stages}

    import numpy as np
    lat_ms = {}
    for kind, xs in lat.items():
        if len(xs) >= 5 and kind != "imu":
            a = np.asarray(xs) * 1e3
            lat_ms[kind] = {"p50": round(float(np.percentile(a, 50)), 1),
                            "p95": round(float(np.percentile(a, 95)), 1),
                            "n": len(xs)}
    counts = {k: len(v) for k, v in lat.items()}
    return {"value": span / wall, "stage_busy": busy,
            "latency_ms": lat_ms, "events": counts,
            "budget_overruns": system.estimator.budget_overruns,
            "solver_iters": system.estimator._iters_current}


def precompile_in_subprocess() -> bool:
    """Populate the tunnel server's XLA compile cache from a THROWAWAY
    subprocess.  Heavy cache-miss compiles permanently degrade the session
    that performs them (~25 ms on every subsequent blocking sync — PERF.md
    §2), so the measuring process must only ever compile cache-hits.  The
    subprocess runs the identical warm code path (same shapes, same
    configs → identical HLO), gets poisoned, and exits."""
    if os.environ.get("BENCH_PRECOMPILE", "1") != "1":
        return False
    budget = float(os.environ.get("BENCH_PRECOMPILE_TIMEOUT_S", "1500"))
    _log(f"precompile subprocess (timeout {budget:.0f}s)")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--precompile"],
            capture_output=True, text=True, timeout=budget,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        ok = r.returncode == 0 and "PRECOMPILE_OK" in r.stdout
        _log(f"precompile {'ok' if ok else 'FAILED'} "
             f"(rc={r.returncode}): {r.stdout.strip()[-200:]} "
             f"{r.stderr.strip()[-200:] if not ok else ''}")
        return ok
    except subprocess.TimeoutExpired:
        _log("precompile subprocess timed out — continuing without it")
        return False


def _emit(value, degraded=False, error=None, extra=None):
    """Print THE one JSON line.  A round must never end without it."""
    rec = {
        "metric": "pipeline_sensor_sec_per_sec",
        "value": round(float(value), 3),
        "unit": ("sensor-sec/s (200Hz IMU + 30Hz 640x480 video + "
                 "10Hz 16x900pt lidar, full SLAM)"),
        "vs_baseline": round(float(value) / BASELINE_SENSOR_SEC_PER_SEC, 3),
    }
    if degraded:
        rec["degraded"] = True
    if error:
        rec["error"] = str(error)[:500]
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    ok, probe_err = probe_backend()
    degraded = not ok
    if degraded:
        # persistent backend failure: record a CPU-backend pipeline number
        # tagged as degraded rather than crashing with no value at all
        _log(f"default backend unreachable ({probe_err}); "
             "falling back to in-process CPU backend")
        import jax
        jax.config.update("jax_platforms", "cpu")
        warm_s = float(os.environ.get("BENCH_DEGRADED_WARM_S", "3.0"))
        meas_s = float(os.environ.get("BENCH_DEGRADED_MEAS_S", "4.0"))
        os.environ.setdefault("BENCH_SETTLE_S", "10")
        precompiled = False
    else:
        warm_s, meas_s = WARM_S, MEAS_S
        precompiled = precompile_in_subprocess()

    try:
        res = run_pipeline_bench(warm_s, meas_s)
    except Exception as e:   # noqa: BLE001 — the record must still exist
        import traceback
        traceback.print_exc()
        _emit(0.0, degraded=degraded,
              error=(probe_err + " | " if degraded else "")
              + f"bench run failed: {e!r}")
        return
    _emit(res["value"], degraded=degraded,
          error=probe_err if degraded else None,
          extra={"stage_busy_s": res["stage_busy"],
                 "latency_ms": res.get("latency_ms", {}),
                 "events": res.get("events", {}),
                 "budget_overruns": res.get("budget_overruns", 0),
                 "solver_iters": res.get("solver_iters"),
                 "meas_sensor_s": meas_s,
                 "precompiled": precompiled,
                 "backend": "cpu-fallback" if degraded else "default"})


if __name__ == "__main__":
    if "--precompile" in sys.argv:
        # throwaway compile-cache warmer (see precompile_in_subprocess)
        run_pipeline_bench(WARM_S, 2.0, precompile_only=True)
        print("PRECOMPILE_OK", flush=True)
        sys.exit(0)
    main()
    sys.exit(0)
