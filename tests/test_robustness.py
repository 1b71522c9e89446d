"""Robustness + advanced-parity behaviors: online td estimation, failure
injection → reboot → re-initialization, LPS feedback pull."""

import numpy as np
import pytest
import jax.numpy as jnp

from mvil_fusion_tpu.config import EstimatorConfig, ImuConfig, SystemConfig
from mvil_fusion_tpu.estimator.vio import VIOEstimator
from mvil_fusion_tpu.estimator import lidar_factors as lfac
from mvil_fusion_tpu.utils import lie

pytestmark = pytest.mark.slow  # full e2e ladder; fast subset: -m 'not slow'

from test_vio_e2e import align_umeyama_4dof, make_world


def make_td_cfg(estimate_td=True):
    return SystemConfig(
        estimator=EstimatorConfig(
            max_features=128,
            ric=(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0),
            tic=(0.0, 0.0, 0.0),
            td_init=0.0,
            estimate_extrinsic=0,
            estimate_td=estimate_td,
            max_solver_iters=8,
        ),
        imu=ImuConfig(g_norm=9.795),
    )


def run_with_td(world, cfg, td_true, t0=0.5, t_end=4.5, seed=0):
    """Features are captured at t + td_true but STAMPED t (the reference's
    'image clock + td = real clock' convention)."""
    rng = np.random.default_rng(seed)
    est = VIOEstimator(cfg)
    traj = world.traj
    frame_times = np.arange(t0, t_end, 0.1)
    ric = np.eye(3)
    tic = np.zeros(3)
    prev_norm = {}
    prev_t = None
    gt = []
    for fi, t in enumerate(frame_times):
        t_prev = frame_times[fi - 1] if fi > 0 else t - 0.1
        acc, gyr, dts, ts = traj.imu_sequence(
            max(t_prev, 0.0) + 1e-9, t, 200.0,
            noise_acc=cfg.imu.acc_n, noise_gyr=cfg.imu.gyr_n, rng=rng)
        for k in range(len(ts)):
            est.process_imu(ts[k], acc[k], gyr[k])
        uv, norm, z, vis = world.project(t + td_true, ric, tic)
        ids = np.nonzero(vis)[0][:150]
        n = norm[ids] + rng.normal(scale=0.3 / 460.0, size=(len(ids), 2))
        vel = np.zeros((len(ids), 2), np.float32)
        if prev_t is not None:
            for j, fid in enumerate(ids):
                if fid in prev_norm:
                    vel[j] = (n[j] - prev_norm[fid]) / (t - prev_t)
        prev_norm = {fid: n[j] for j, fid in enumerate(ids)}
        prev_t = t
        est.process_features(t, ids, n.astype(np.float32), vel)
        gt.append((t, *traj.state_at(t)))
    return est, gt


def test_td_estimated_online():
    # calmer trajectory: the td gradient rides on finite-difference feature
    # velocities (backward diff, same as the reference's tracker), whose
    # curvature bias grows with angular excitation
    from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
    world = SyntheticWorld(
        traj=SyntheticTrajectory(duration=9.0, w_amp=(0.4, 0.35, 0.45),
                                 w_freq=(0.3, 0.25, 0.35),
                                 p_amp=(1.5, 1.3, 0.5),
                                 p_freq=(0.4, 0.45, 0.3)),
        n_landmarks=500, landmark_radius=8.0)
    td_true = 0.03
    est, gt = run_with_td(world, make_td_cfg(True), td_true, t_end=6.5)
    assert est.status == VIOEstimator.NON_LINEAR
    td_est = float(np.asarray(est.state.td))
    # td converges through the marginalization prior over tens of seconds
    # (same dynamics as the reference); after ~6 s expect the right sign and
    # a substantial fraction of the magnitude
    assert 0.25 * td_true < td_est < 2.0 * td_true, td_est
    # and td stays pinned when estimation is disabled
    est0, _ = run_with_td(world, make_td_cfg(False), td_true, t_end=3.0)
    assert abs(float(np.asarray(est0.state.td))) < 1e-6


def test_failure_injection_reboots_and_recovers():
    world = make_world(duration=10.0)
    cfg = make_td_cfg(True)
    est, gt = run_with_td(world, cfg, 0.0, t_end=2.5)
    assert est.status == VIOEstimator.NON_LINEAR
    n_traj = len(est.trajectory)

    # inject corrupted IMU (a large spurious specific-force offset) while
    # features stay clean — the optimizer pushes it into the accel bias
    # until the failure gate (fail_ba_norm) trips, as the reference's
    # failureDetection does (estimator.cpp:1076-1122).
    rng = np.random.default_rng(9)
    traj = world.traj
    ric = np.eye(3)
    tic = np.zeros(3)
    prev_norm = {}
    prev_t = None
    # strong enough that the gate trips well inside the window (at 15 m/s²
    # the trip point sat at the last frames — flaky against the chaotic
    # pipeline's run-to-run numeric noise)
    for k, t in enumerate(np.arange(2.5, 5.1, 0.1)):
        acc, gyr, dts, ts = traj.imu_sequence(t - 0.1 + 1e-9, t, 200.0)
        for i in range(len(ts)):
            est.process_imu(ts[i], acc[i] + np.asarray([22.0, -18.0, 15.0]),
                            gyr[i])
        uv, norm, z, vis = world.project(t, ric, tic)
        ids = np.nonzero(vis)[0][:150]
        n = norm[ids]
        vel = np.zeros((len(ids), 2), np.float32)
        est.process_features(t, ids, n.astype(np.float32), vel)
    assert est.failures >= 1 or est.status == VIOEstimator.INITIAL

    # clean data resumes → re-initializes
    prev_norm = {}
    prev_t = None
    ric = np.eye(3)
    tic = np.zeros(3)
    # generous clean-data window: the reboot can fire a SECOND time while
    # corrupt intervals are still inside the window, and re-initialization
    # needs the window to refill (~1.5 s) after that — both timings move
    # with run-to-run numeric noise
    for t in np.arange(5.1, 9.3, 0.1):
        acc, gyr, dts, ts = traj.imu_sequence(t - 0.1 + 1e-9, t, 200.0)
        for i in range(len(ts)):
            est.process_imu(ts[i], acc[i], gyr[i])
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
    assert est.status == VIOEstimator.NON_LINEAR
    assert len(est.trajectory) > n_traj + 10


def test_lps_factor_pulls_window_rotation():
    """An LPS feedback pose should rotate the window toward the localizer
    estimate (rotation-only factor)."""
    from mvil_fusion_tpu.estimator import ba, state as st
    from helpers import build_window_problem, make_problem, perturb_state
    from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld

    world = SyntheticWorld(
        traj=SyntheticTrajectory(duration=8.0, w_amp=(0.9, 0.8, 1.0),
                                 w_freq=(0.5, 0.4, 0.6)),
        landmark_radius=8.0)
    s_true, feats, preints, imask, times = build_window_problem(world)
    prob = make_problem(s_true, feats, preints, imask)

    # LPS measurement: the TRUE rotation at mid-frame 3.5 — build extras
    q_meas = lie.quat_slerp(s_true.q[3], s_true.q[4], 0.5)
    tab = lfac.empty_lps()
    tab = tab._replace(
        ids=tab.ids.at[0].set(jnp.asarray([3, 4], jnp.int32)),
        alpha=tab.alpha.at[0].set(0.5),
        q_meas=tab.q_meas.at[0].set(q_meas),
        active=tab.active.at[0].set(True))

    s0 = perturb_state(s_true, np.random.default_rng(3), dth=0.05)
    J, r = lfac.lps_system(s0, tab)
    prob2 = prob._replace(extra_J=J, extra_r=r, extra_x0=s0)
    res = ba.solve(s0, prob2, 460.0, iters=8)
    # rotation at frames 3/4 closer to truth than without LPS
    res_no = ba.solve(s0, prob, 460.0, iters=8)
    def rot_err(s):
        return max(np.linalg.norm(np.asarray(lie.quat_boxminus(
            s.q[k], s_true.q[k]))) for k in (3, 4))
    assert rot_err(res.state) <= rot_err(res_no.state) + 1e-4

def test_solver_budget_adapts_iterations():
    """Overrunning the wall-clock budget halves the LM iteration count for
    subsequent frames (reference ceres 0.05 s cap, estimator.cpp:1400-1414);
    sustained headroom steps back up."""
    from mvil_fusion_tpu.config import EstimatorConfig, SystemConfig
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    import dataclasses
    cfg = SystemConfig()
    cfg = cfg.replace(estimator=dataclasses.replace(
        cfg.estimator, max_solver_iters=8, min_solver_iters=4,
        solver_time_budget_s=0.05))
    est = VIOEstimator(cfg)
    est.enforce_budget = True             # real-time mode
    est._solves = 10
    assert est._iters_current == 8
    est._update_iter_budget(0.2)          # overrun
    assert est._iters_current == 4
    assert est.budget_overruns == 1
    est._update_iter_budget(9.0)          # compile hiccup: ignored
    assert est.budget_overruns == 1
    for _ in range(20):                   # sustained headroom: step up
        est._update_iter_budget(0.01)
    assert est._iters_current == 8
    assert est.solve_info["solver_iters"] == 8
    # budget disabled -> no adaptation
    cfg2 = cfg.replace(estimator=dataclasses.replace(
        cfg.estimator, solver_time_budget_s=0.0))
    est2 = VIOEstimator(cfg2)
    est2.enforce_budget = True
    est2._solves = 10
    est2._update_iter_budget(1.0)
    assert est2._iters_current == 8 and est2.budget_overruns == 0
    # offline mode (enforce_budget False): reports but never adapts
    est3 = VIOEstimator(cfg)
    est3._solves = 10
    est3._update_iter_budget(1.0)
    assert est3._iters_current == 8 and est3.budget_overruns == 0
    assert est3.solve_info["solve_block_s"] == 1.0
