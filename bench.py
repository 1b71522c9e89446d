"""Benchmark: sliding-window VIO bundle-adjustment rate on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference sustains 15 Hz VIO publish (indoor config) with a
50 ms Ceres budget per solve on CPU (BASELINE.md).  vs_baseline is the ratio
of our window-solve rate to that 15 Hz envelope — i.e. how many times
faster than real-time-at-reference-rate the core solver runs.
"""

import json
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent / "tests"))

BASELINE_HZ = 15.0


def main():
    import jax

    from __graft_entry__ import _build_problem
    from mvil_fusion_tpu.estimator import ba

    s0, prob = _build_problem()

    @jax.jit
    def solve_step(s, p):
        return ba.solve(s, p, 460.0, iters=8)

    # warm up / compile
    res = solve_step(s0, prob)
    jax.block_until_ready(res)

    # timed: run N solves back-to-back (each one full 8-iteration LM window
    # BA — the reference's per-frame optimization() call)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        res = solve_step(s0, prob)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n

    hz = 1.0 / dt
    print(json.dumps({
        "metric": "vio_window_ba_hz",
        "value": round(hz, 2),
        "unit": "solves/s",
        "vs_baseline": round(hz / BASELINE_HZ, 2),
    }))


if __name__ == "__main__":
    main()
