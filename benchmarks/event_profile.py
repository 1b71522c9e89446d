"""Per-event phase breakdown: host build / H2D / device exec / D2H.

VERDICT r3 task 1 asked for the table nobody captured: WHERE the 300-1400 ms
per event goes.  This drives the synchronous system event-by-event (no
pipeline threads — isolates per-event cost from cross-stage device-queue
contention) and times each phase with explicit block_until_ready fences:

  image   : tracker program (enqueue vs device), depth lookup, pack D2H
  features: host table build, frame-step program (enqueue vs device), D2H
  sweep   : compensator, deskew+VGICP program
  lidar_out: LOAM+scan-to-map program, global add_submap

Usage:  python benchmarks/event_profile.py [meas_s]
Writes a markdown table to stdout (paste into PERF.md).
"""

import pathlib
import sys
import time
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402


class Phase:
    """Accumulate (count, seconds) per (kind, phase)."""

    def __init__(self):
        self.acc = defaultdict(lambda: [0, 0.0])

    def add(self, kind, phase, dt):
        cell = self.acc[(kind, phase)]
        cell[0] += 1
        cell[1] += dt


def main():
    meas_s = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    warm_s = 4.0

    from mvil_fusion_tpu.io.fixture import fixture_config
    from mvil_fusion_tpu.pipeline.system import VilSystem

    cfg = fixture_config()
    system = VilSystem(cfg, use_tracker=True, enable_mapping=True)
    msgs = bench.build_stream(warm_s + meas_s)

    ph = Phase()
    est = system.estimator

    # --- instrument the estimator's fused frame step -----------------------
    import mvil_fusion_tpu.estimator.vio as vio_mod
    orig_frame_step = vio_mod._frame_step_jit

    def timed_frame_step(*a, **kw):
        t0 = time.perf_counter()
        out = orig_frame_step(*a, **kw)
        t1 = time.perf_counter()
        jax.block_until_ready(out[0])
        t2 = time.perf_counter()
        ph.add("features", "frame_step.enqueue", t1 - t0)
        ph.add("features", "frame_step.device", t2 - t1)
        return out

    # --- drive --------------------------------------------------------------
    measuring = False
    t_wall0 = None
    n_ev = defaultdict(int)
    for kind, t, payload in msgs:
        if not measuring and t >= warm_s:
            measuring = True
            vio_mod._frame_step_jit = timed_frame_step
            ph.acc.clear()
            n_ev.clear()
            t_wall0 = time.perf_counter()
        n_ev[kind] += 1
        if kind == "imu":
            acc, gyr = payload
            t0 = time.perf_counter()
            system.process_imu(t, acc, gyr)
            ph.add("imu", "total", time.perf_counter() - t0)
        elif kind == "image":
            (img,) = payload
            t0 = time.perf_counter()
            publish, out = system.tracker.process_device(t, img)
            t1 = time.perf_counter()
            jax.block_until_ready(out.packed)
            t2 = time.perf_counter()
            ph.add("image", "tracker.enqueue", t1 - t0)
            ph.add("image", "tracker.device", t2 - t1)
            if publish:
                t0 = time.perf_counter()
                packed = np.asarray(out.packed)
                t1 = time.perf_counter()
                frame = system.tracker.publish_from_packed(t, packed)
                ids = frame.ids[frame.valid]
                norm = frame.norm[frame.valid]
                vel = frame.vel[frame.valid]
                t2 = time.perf_counter()
                depth = system._feature_depths(t, norm,
                                               np.ones(len(ids), bool))
                t3 = time.perf_counter()
                ph.add("image", "pack.d2h", t1 - t0)
                ph.add("image", "pack.host", t2 - t1)
                ph.add("image", "depth_lookup", t3 - t2)
                t0 = time.perf_counter()
                est.process_features(t, ids, norm, vel, depth)
                ph.add("features", "total", time.perf_counter() - t0)
                t0 = time.perf_counter()
                for sweep_, sout, refl in system._drain_sweeps():
                    system._register_depth_cloud(sout)
                    t1 = time.perf_counter()
                    system._map_lidar(sweep_, sout, refl)
                    ph.add("lidar_out", "map_total",
                           time.perf_counter() - t1)
                ph.add("features", "drain_sweeps+map",
                       time.perf_counter() - t0)
        elif kind == "lidar":
            (fields,) = payload
            t0 = time.perf_counter()
            sweep = system.compensator.process(t, fields["pts"])
            t1 = time.perf_counter()
            system.lidar_sweep_count += 1
            system._pending_sweeps.append((sweep, fields.get("intensity")))
            ph.add("sweep", "compensate", t1 - t0)

    wall = time.perf_counter() - t_wall0
    system.flush()

    print(f"\nsync single-thread: {meas_s:.1f} sensor-s in {wall:.1f} wall-s"
          f" ({meas_s / wall:.3f} sensor-sec/s; threads would overlap "
          f"stages)\n")
    print(f"| kind | phase | n | total s | ms/evt | s per sensor-s |")
    print(f"|---|---|---|---|---|---|")
    for (kind, phase), (n, s) in sorted(ph.acc.items(),
                                        key=lambda kv: -kv[1][1]):
        print(f"| {kind} | {phase} | {n} | {s:.2f} | {1e3 * s / n:.1f} "
              f"| {s / meas_s:.2f} |")
    print(f"\nevents: {dict(n_ev)}")


if __name__ == "__main__":
    main()
