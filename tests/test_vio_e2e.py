"""End-to-end mono VIO on a synthetic sequence: initialization from scratch,
sliding-window tracking, ATE vs ground truth (the engine's equivalent of the
reference's Frontend.txt comparison, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvil_fusion_tpu.config import (CameraConfig, EstimatorConfig, ImuConfig,
                                    SystemConfig)
from mvil_fusion_tpu.estimator.vio import VIOEstimator
from mvil_fusion_tpu.io.synthetic import (SyntheticTrajectory, SyntheticWorld,
                                          _quat_to_mat)


def make_world(duration=14.0):
    traj = SyntheticTrajectory(duration=duration,
                               w_amp=(0.5, 0.45, 0.55),
                               w_freq=(0.4, 0.33, 0.47),
                               p_amp=(1.2, 1.0, 0.4),
                               p_freq=(0.33, 0.41, 0.23))
    return SyntheticWorld(traj=traj, n_landmarks=500, landmark_radius=8.0)


def make_cfg():
    return SystemConfig(
        estimator=EstimatorConfig(
            max_features=128,
            ric=(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0),   # identity extrinsics
            tic=(0.0, 0.0, 0.0),
            td_init=0.0,
            estimate_extrinsic=0,
            estimate_td=False,
            max_solver_iters=8,
        ),
        imu=ImuConfig(g_norm=9.795),
    )


def run_sequence(world, cfg, t0=0.5, t_end=12.0, frame_hz=10.0,
                 imu_hz=200.0, noise_px=0.3, imu_noise=True, seed=0,
                 ba_true=(0.0, 0.0, 0.0), bg_true=(0.0, 0.0, 0.0)):
    rng = np.random.default_rng(seed)
    est = VIOEstimator(cfg)
    traj = world.traj
    frame_times = np.arange(t0, t_end, 1.0 / frame_hz)
    ric = np.eye(3)
    tic = np.zeros(3)

    acc_n = cfg.imu.acc_n if imu_noise else 0.0
    gyr_n = cfg.imu.gyr_n if imu_noise else 0.0

    gt = []
    prev_norm = {}
    prev_t = None
    for fi, t in enumerate(frame_times):
        # IMU since previous frame
        t_prev = frame_times[fi - 1] if fi > 0 else t - 1.0 / frame_hz
        acc, gyr, dts, ts = traj.imu_sequence(
            max(t_prev, 0.0) + 1e-9, t, imu_hz, ba=ba_true, bg=bg_true,
            noise_acc=acc_n, noise_gyr=gyr_n, rng=rng)
        for k in range(len(ts)):
            est.process_imu(ts[k], acc[k], gyr[k])

        uv, norm, z, vis = world.project(t, ric, tic)
        ids = np.nonzero(vis)[0]
        # cap features per frame like the tracker would
        ids = ids[:150]
        n = norm[ids] + rng.normal(scale=noise_px / 460.0,
                                   size=(len(ids), 2))
        vel = np.zeros((len(ids), 2), np.float32)
        if prev_t is not None:
            dt = t - prev_t
            for j, fid in enumerate(ids):
                if fid in prev_norm:
                    vel[j] = (n[j] - prev_norm[fid]) / dt
        prev_norm = {fid: n[j] for j, fid in enumerate(ids)}
        prev_t = t
        est.process_features(t, ids, n.astype(np.float32), vel)
        p_gt, q_gt, v_gt = traj.state_at(t)
        gt.append((t, p_gt, q_gt, v_gt))
    return est, gt


def align_umeyama_4dof(est_traj, gt):
    """Yaw+translation alignment (mono-VIO gauge freedom)."""
    t_est = np.asarray([p for (_, p, _, _) in est_traj])
    gt_times = np.asarray([t for (t, *_), in zip(gt)])
    t_gt = []
    for (t, _, _, _) in est_traj:
        k = int(np.argmin(np.abs(gt_times - t)))   # td-shifted stamps OK
        t_gt.append(gt[k][1])
    t_gt = np.asarray(t_gt)
    # fit yaw + translation
    c_est = t_est - t_est.mean(0)
    c_gt = t_gt - t_gt.mean(0)
    num = np.sum(c_gt[:, 0] * c_est[:, 1] - c_gt[:, 1] * c_est[:, 0])
    den = np.sum(c_gt[:, 0] * c_est[:, 0] + c_gt[:, 1] * c_est[:, 1])
    yaw = np.arctan2(num, den)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.asarray([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
    t_est_aligned = c_est @ R.T + t_gt.mean(0)
    err = np.linalg.norm(t_est_aligned - t_gt, axis=1)
    return float(np.sqrt((err ** 2).mean())), err


@pytest.mark.slow
def test_vio_e2e_initializes_and_tracks():
    world = make_world(duration=8.0)
    cfg = make_cfg()
    est, gt = run_sequence(world, cfg, t_end=5.0)
    assert est.status == VIOEstimator.NON_LINEAR, "failed to initialize"
    assert est.failures == 0
    assert len(est.trajectory) > 30

    ate, err = align_umeyama_4dof(est.trajectory, gt)
    # synthetic, 0.3 px + IMU noise over ~4.5 s
    assert ate < 0.3, f"ATE {ate:.3f} m"


def test_vio_e2e_with_bias():
    world = make_world(duration=8.0)
    cfg = make_cfg()
    est, gt = run_sequence(world, cfg, bg_true=(0.01, -0.015, 0.02),
                           ba_true=(0.05, -0.03, 0.08), t_end=4.5)
    assert est.status == VIOEstimator.NON_LINEAR
    ate, err = align_umeyama_4dof(est.trajectory, gt)
    assert ate < 0.35, f"ATE {ate:.3f} m"
    # gyro bias should be roughly recovered by the window estimator
    bg_est = np.asarray(est.state.bg[-1])
    np.testing.assert_allclose(bg_est, [0.01, -0.015, 0.02], atol=0.015)
