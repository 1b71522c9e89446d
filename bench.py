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

WARM_S = 4.0       # drives initialization + all compiles
MEAS_S = 8.0
IMU_HZ, IMG_HZ, LIDAR_HZ = 200.0, 30.0, 10.0
BASELINE_SENSOR_SEC_PER_SEC = 1.0


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


def main():
    import jax
    from mvil_fusion_tpu.io.fixture import fixture_config
    from mvil_fusion_tpu.pipeline.async_system import build_pipeline
    from mvil_fusion_tpu.pipeline.system import VilSystem

    cfg = fixture_config()
    system = VilSystem(cfg, use_tracker=True, enable_mapping=True)
    _log("building sensor stream")
    msgs = build_stream(WARM_S + MEAS_S)
    warm = [m for m in msgs if m[1] < WARM_S]
    meas = [m for m in msgs if m[1] >= WARM_S]
    _log(f"stream ready: {len(warm)} warm + {len(meas)} timed msgs")

    pipe = build_pipeline(system, deterministic=False)
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
        assert pipe.quiesce(timeout=900.0), "warmup did not quiesce"
        _log(f"warm done; estimator status={system.estimator.status} "
             f"frames={len(system.frontend_trajectory())}")
        # let XLA's background compilation threads drain — they otherwise
        # starve the host threads on this 4-core box during the timed
        # segment (stages+feeder measured ~5 s busy inside a ~100 s wall)
        settle = float(os.environ.get("BENCH_SETTLE_S", "90"))
        time.sleep(settle)
        _log(f"settled {settle:.0f}s")

        base_busy = {st.name: st.busy_s for st in pipe.stages}
        t0 = time.perf_counter()
        for m in meas:
            kind, t, payload = m
            if kind == "lidar":
                (fields,) = payload
                payload = (fields["pts"], fields.get("intensity"))
            pipe.feed((kind, t, payload))
        _log("timed fed; quiescing")
        assert pipe.quiesce(timeout=900.0), "measurement did not quiesce"
        wall = time.perf_counter() - t0
        _log(f"timed done in {wall:.1f}s; stage busy during timed segment: "
             + ", ".join(
                 f"{st.name}={st.busy_s - base_busy[st.name]:.1f}s"
                 f"(n={st.processed})" for st in pipe.stages))
    finally:
        pipe.stop(timeout=120.0)

    for st in pipe.stages:
        if st.errors:
            raise RuntimeError(f"stage {st.name}:\n" + st.errors[0])
    span = meas[-1][1] - meas[0][1]
    value = span / wall
    print(json.dumps({
        "metric": "pipeline_sensor_sec_per_sec",
        "value": round(value, 3),
        "unit": "sensor-sec/s (200Hz IMU + 30Hz 640x480 video + 10Hz 16x900pt lidar, full SLAM)",
        "vs_baseline": round(value / BASELINE_SENSOR_SEC_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
