"""Checkpoint/resume: a mid-run save must restore to a state that continues
producing the same estimates."""

import os
import tempfile

import numpy as np
import pytest

from mvil_fusion_tpu.utils import checkpoint, timing
from mvil_fusion_tpu.estimator.vio import VIOEstimator

from test_vio_e2e import make_cfg, make_world, run_sequence


def drive(est, world, cfg, t0, t_end, rng):
    """Feed frames into an existing estimator (mirrors run_sequence)."""
    traj = world.traj
    frame_times = np.arange(t0, t_end, 0.1)
    prev_norm = {}
    prev_t = None
    ric = np.eye(3)
    tic = np.zeros(3)
    for fi, t in enumerate(frame_times):
        t_prev = frame_times[fi - 1] if fi > 0 else t - 0.1
        acc, gyr, dts, ts = traj.imu_sequence(max(t_prev, 0.0) + 1e-9, t,
                                              200.0)
        for k in range(len(ts)):
            est.process_imu(ts[k], acc[k], gyr[k])
        uv, norm, z, vis = world.project(t, ric, tic)
        ids = np.nonzero(vis)[0][:150]
        n = norm[ids]
        vel = np.zeros((len(ids), 2), np.float32)
        if prev_t is not None:
            for j, fid in enumerate(ids):
                if fid in prev_norm:
                    vel[j] = (n[j] - prev_norm[fid]) / (t - prev_t)
        prev_norm = {fid: n[j] for j, fid in enumerate(ids)}
        prev_t = t
        est.process_features(t, ids, n.astype(np.float32), vel)
    return est


@pytest.mark.slow
def test_checkpoint_resume_continues():
    world = make_world(duration=8.0)
    cfg = make_cfg()
    rng = np.random.default_rng(0)

    est = VIOEstimator(cfg)
    drive(est, world, cfg, 0.5, 2.6, rng)
    assert est.status == VIOEstimator.NON_LINEAR
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        checkpoint.save_system(est, path)

        # continue the original
        drive(est, world, cfg, 2.6, 3.4, rng)
        p_ref = np.asarray(est.state.p)

        # restore into a fresh estimator and continue identically
        est2 = VIOEstimator(cfg)
        checkpoint.load_system(est2, path)
        assert est2.status == VIOEstimator.NON_LINEAR
        drive(est2, world, cfg, 2.6, 3.4, rng)
        p_new = np.asarray(est2.state.p)
        np.testing.assert_allclose(p_new, p_ref, atol=1e-4)
        assert len(est2.trajectory) == len(est.trajectory)


def test_profiler_sections():
    prof = timing.Profiler()
    with prof.section("a"):
        x = sum(range(1000))
    with prof.section("a"):
        pass
    with prof.section("b", sync=True):
        pass
    assert prof.stats["a"].count == 2
    assert "a" in prof.summary() and "b" in prof.summary()
