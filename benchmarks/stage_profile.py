"""Per-event-kind stage timing for the threaded pipeline.

Drives the same stream as bench.py but wraps every stage function to
accumulate wall time per message kind, so we can see WHERE each stage's
busy seconds go (tracker program vs depth lookup vs frame step vs sweep
vs mapping vs host bookkeeping).

Usage:  python benchmarks/stage_profile.py [warm_s] [meas_s]
"""

import pathlib
import sys
import time
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import bench  # noqa: E402  (reuse the stream builder + rates)


def main():
    warm_s = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    meas_s = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0

    from mvil_fusion_tpu.io.fixture import fixture_config
    from mvil_fusion_tpu.pipeline.async_system import build_pipeline
    from mvil_fusion_tpu.pipeline.system import VilSystem

    cfg = fixture_config()
    system = VilSystem(cfg, use_tracker=True, enable_mapping=True)
    msgs = bench.build_stream(warm_s + meas_s)
    warm = [m for m in msgs if m[1] < warm_s]
    meas = [m for m in msgs if m[1] >= warm_s]

    pipe = build_pipeline(system, deterministic=False)

    stats = {}   # stage -> kind -> [count, seconds]

    def wrap(name, fn):
        per = stats.setdefault(name, defaultdict(lambda: [0, 0.0]))

        def wrapped(msg):
            kind = msg[0]
            t0 = time.perf_counter()
            out = fn(msg)
            dt = time.perf_counter() - t0
            cell = per[kind]
            cell[0] += 1
            cell[1] += dt
            return out
        return wrapped

    for st in pipe.stages:
        st.fn = wrap(st.name, st.fn)

    def feed_all(batch):
        for kind, t, payload in batch:
            if kind == "lidar":
                (fields,) = payload
                payload = (fields["pts"], fields.get("intensity"))
            pipe.feed((kind, t, payload))

    pipe.start()
    try:
        feed_all(warm)
        if not pipe.quiesce(timeout=900.0):
            raise RuntimeError("warmup did not quiesce within 900 s — "
                               "timing numbers would be bogus")
        print(f"warm done; frames={len(system.frontend_trajectory())}",
              file=sys.stderr, flush=True)
        time.sleep(15.0)
        for per in stats.values():
            per.clear()
        t0 = time.perf_counter()
        feed_all(meas)
        # flush sentinel: harvest the deferred tail so the last frame/pack
        # is included in the per-kind stats (run_threaded does the same)
        pipe.feed(("flush", meas[-1][1] if meas else 0.0, ()))
        if not pipe.quiesce(timeout=900.0):
            raise RuntimeError("measurement did not quiesce within 900 s")
        wall = time.perf_counter() - t0
    finally:
        pipe.stop(timeout=120.0)
    for st in pipe.stages:
        if st.errors:
            raise RuntimeError(st.errors[0])

    # actual measured sensor span (matches bench.py's official metric)
    span = (meas[-1][1] - meas[0][1]) if len(meas) >= 2 else meas_s
    print(f"\ntimed: {span:.1f} sensor-s in {wall:.1f} wall-s "
          f"({span / wall:.3f} sensor-sec/s)\n")
    print(f"{'stage':<10} {'kind':<10} {'n':>5} {'total s':>8} "
          f"{'ms/evt':>8} {'s per sensor-s':>14}")
    for name, per in stats.items():
        for kind, (n, s) in sorted(per.items(), key=lambda kv: -kv[1][1]):
            if n == 0:
                continue
            print(f"{name:<10} {kind:<10} {n:>5} {s:>8.2f} "
                  f"{1e3 * s / n:>8.1f} {s / span:>14.2f}")


if __name__ == "__main__":
    main()
