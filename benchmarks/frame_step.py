"""Benchmark: full VIO frame-step rate on one chip.

Measures the FUSED per-frame device program of the estimator —
IMU preintegration + landmark triangulation + LiDAR/LPS factor stacking +
8-iteration Schur-LM window BA + marginalization — i.e. everything the
reference does per frame in `process()` (Ceres solve budget: 50 ms,
BASELINE.md) fused into one XLA executable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's 15 Hz VIO publish rate (indoor config).
"""

import json
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))

BASELINE_HZ = 15.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvil_fusion_tpu.estimator import factors as fac, lidar_factors as lfac
    from mvil_fusion_tpu.estimator import vio
    from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
    from mvil_fusion_tpu.ops import preintegration as pre
    from helpers import build_window_problem, perturb_state

    world = SyntheticWorld(
        traj=SyntheticTrajectory(duration=4.0, w_amp=(0.9, 0.8, 1.0),
                                 w_freq=(0.5, 0.4, 0.6)),
        landmark_radius=8.0)
    W, F = 7, 128
    s_true, feats, preints, imask, times = build_window_problem(
        world, t0=1.0, W=W, F=F)
    s0 = perturb_state(s_true, np.random.default_rng(0))

    # raw IMU buffers for the fused step
    accs = np.zeros((W - 1, vio.IMU_NMAX, 3), np.float32)
    gyrs = np.zeros((W - 1, vio.IMU_NMAX, 3), np.float32)
    dts = np.zeros((W - 1, vio.IMU_NMAX), np.float32)
    masks = np.zeros((W - 1, vio.IMU_NMAX), bool)
    for k in range(W - 1):
        acc, gyr, dt, _ = world.traj.imu_sequence(times[k], times[k + 1],
                                                  200.0)
        n = len(acc)
        accs[k, :n], gyrs[k, :n], dts[k, :n] = acc, gyr, dt
        masks[k, :n] = True

    from mvil_fusion_tpu.estimator import ba

    noise_cov = pre.noise_covariance(0.02, 0.005, 0.006, 0.0008)
    prior = fac.empty_prior(W, F)
    args = (s0, feats, jnp.zeros((F,), bool),
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.asarray(masks), prior,
            jnp.asarray([0.0, 0.0, 9.795], jnp.float32), noise_cov,
            lfac.empty_icp(), lfac.empty_lps(), jnp.asarray(False),
            ba.make_fix_mask(W))
    kwargs = dict(focal=460.0, iters=8, marg_old=True)

    out = vio._frame_step_jit(*args, **kwargs)
    jax.block_until_ready(out)

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = vio._frame_step_jit(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n

    hz = 1.0 / dt
    print(json.dumps({
        "metric": "vio_frame_step_hz",
        "value": round(hz, 2),
        "unit": "frames/s",
        "vs_baseline": round(hz / BASELINE_HZ, 2),
    }))


if __name__ == "__main__":
    main()
