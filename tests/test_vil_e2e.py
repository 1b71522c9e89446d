"""VIL coupling tests: lidar factors + end-to-end VIO+LiDAR on synthetic
data (config 2 of BASELINE.json — full VIL odometry)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mvil_fusion_tpu.config import EstimatorConfig, ImuConfig, LidarConfig, SystemConfig
from mvil_fusion_tpu.estimator import lidar_factors as lfac
from mvil_fusion_tpu.estimator import state as st
from mvil_fusion_tpu.estimator.vio import VIOEstimator
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
from mvil_fusion_tpu.utils import lie

pytestmark = pytest.mark.slow  # full e2e ladder; fast subset: -m 'not slow'

from test_vio_e2e import align_umeyama_4dof, make_cfg as make_mono_cfg


# ---------------------------------------------------------------------------
# factor unit tests
# ---------------------------------------------------------------------------

def _toy_state(W=7, F=8):
    rng = np.random.default_rng(0)
    s = st.make_window_state(W, F)
    p = np.cumsum(rng.normal(scale=0.2, size=(W, 3)), axis=0).astype(np.float32)
    q = []
    qq = np.asarray([1.0, 0, 0, 0], np.float32)
    for k in range(W):
        d = rng.normal(scale=0.05, size=3).astype(np.float32)
        qq = np.asarray(lie.quat_boxplus(jnp.asarray(qq), jnp.asarray(d)))
        q.append(qq)
    return s._replace(p=jnp.asarray(p), q=jnp.asarray(np.asarray(q)))


def test_icp_factor_zero_at_consistent_measurement():
    s = _toy_state()
    # constraint between interpolated poses at alpha=0 of frames (1,2) and
    # (4,5): measured translation = Qi^-1 (Pj - Pi) rotated per the factor
    ids = np.zeros((lfac.MAX_ICP, 4), np.int32)
    ids[0] = (1, 2, 4, 5)
    Pi, Qi = np.asarray(s.p[1]), np.asarray(s.q[1])
    Pj, Qj = np.asarray(s.p[4]), np.asarray(s.q[4])
    t_meas = np.asarray(lie.quat_rotate_inv(jnp.asarray(Qi),
                                            jnp.asarray(Pj - Pi)))
    tab = lfac.empty_icp()._replace(
        ids=jnp.asarray(ids),
        trans_p=jnp.zeros((lfac.MAX_ICP, 3)).at[0].set(jnp.asarray(t_meas)),
        weight=jnp.zeros(lfac.MAX_ICP).at[0].set(100.0),
        active=jnp.zeros(lfac.MAX_ICP, bool).at[0].set(True))
    J, r = lfac.icp_system(s, tab)
    assert np.abs(np.asarray(r)).max() < 1e-3
    assert np.abs(np.asarray(J)).max() > 1.0  # jacobian nontrivial
    # wrong measurement → residual appears in x/z rows
    tab2 = tab._replace(trans_p=tab.trans_p.at[0].add(
        jnp.asarray([0.3, 0.0, 0.2])))
    _, r2 = lfac.lps_system(s, lfac.empty_lps())
    J2, r2 = lfac.icp_system(s, tab2)
    rr = np.asarray(r2)[:3]
    assert abs(rr[0]) > 1.0 and abs(rr[2]) > 1.0 and rr[1] == 0.0


def test_lps_factor_pulls_rotation():
    s = _toy_state()
    tab = lfac.empty_lps()
    q_meas = np.asarray(lie.quat_slerp(s.q[2], s.q[3], 0.5))
    tab = tab._replace(
        ids=tab.ids.at[0].set(jnp.asarray([2, 3], jnp.int32)),
        alpha=tab.alpha.at[0].set(0.5),
        q_meas=tab.q_meas.at[0].set(jnp.asarray(q_meas)),
        active=tab.active.at[0].set(True))
    J, r = lfac.lps_system(s, tab)
    assert np.abs(np.asarray(r)).max() < 1e-4
    # perturbed measurement → nonzero residual
    tab2 = tab._replace(q_meas=tab.q_meas.at[0].set(
        lie.quat_boxplus(jnp.asarray(q_meas), jnp.asarray([0.05, 0, 0]))))
    _, r2 = lfac.lps_system(s, tab2)
    assert np.abs(np.asarray(r2)).max() > 1.0


def test_zero_velocity_rows():
    s = _toy_state()
    s = s._replace(v=s.v.at[5].set(jnp.asarray([0.5, -0.2, 0.1])))
    J, r = lfac.zero_velocity_system(s, True)
    assert np.abs(np.asarray(r)[6:9]).max() > 1e3  # v rows driven to zero
    J0, r0 = lfac.zero_velocity_system(s, False)
    assert np.abs(np.asarray(J0)).max() == 0.0


# ---------------------------------------------------------------------------
# end-to-end VIL
# ---------------------------------------------------------------------------

def make_vil_cfg():
    cfg = make_mono_cfg()
    return cfg.replace(lidar=LidarConfig(
        rlb=(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0),   # identity LI extrinsics
        tlb=(0.0, 0.0, 0.0),
        vgicp_iters=8,
    ))


def run_vil(world_cam, box, cfg, t0=0.5, t_end=4.0, lidar_hz=5.0, seed=0):
    rng = np.random.default_rng(seed)
    est = VIOEstimator(cfg)
    est.enable_lidar()
    traj = world_cam.traj
    frame_times = np.arange(t0, t_end, 0.1)
    lidar_times = np.arange(t0 + 0.85, t_end - 0.15, 1.0 / lidar_hz)
    ric = np.eye(3)
    tic = np.zeros(3)
    gt = []
    modes = []
    li = 0
    prev_norm = {}
    prev_t = None
    for fi, t in enumerate(frame_times):
        t_prev = frame_times[fi - 1] if fi > 0 else t - 0.1
        acc, gyr, dts, ts = traj.imu_sequence(
            max(t_prev, 0.0) + 1e-9, t, 200.0,
            noise_acc=cfg.imu.acc_n, noise_gyr=cfg.imu.gyr_n, rng=rng)
        for k in range(len(ts)):
            est.process_imu(ts[k], acc[k], gyr[k])
        uv, norm, z, vis = world_cam.project(t, ric, tic)
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
        # feed lidar sweeps whose span [t_l, t_l+0.1] is inside the window
        while (li < len(lidar_times) and lidar_times[li] + 0.1 <= t
               and est.status == VIOEstimator.NON_LINEAR):
            sweep = simulate_sweep(box, traj, lidar_times[li],
                                   n_azimuth=360)
            out = est.process_lidar(sweep["t_start"], sweep["pts"],
                                    sweep["rel_time"], sweep["mask"])
            if out is not None:
                modes.append(out["mode"])
            li += 1
    return est, gt, modes


def test_vil_e2e_runs_with_lidar_constraints():
    traj = SyntheticTrajectory(duration=6.0, w_amp=(0.5, 0.45, 0.55),
                               w_freq=(0.4, 0.33, 0.47),
                               p_amp=(1.2, 1.0, 0.4),
                               p_freq=(0.33, 0.41, 0.23))
    world = SyntheticWorld(traj=traj, n_landmarks=500, landmark_radius=8.0)
    box = BoxWorld()
    cfg = make_vil_cfg()
    est, gt, modes = run_vil(world, box, cfg)
    assert est.status == VIOEstimator.NON_LINEAR
    assert est.failures == 0
    assert len(modes) >= 8, modes
    # moving trajectory: first sweep has no reference (0); after that a
    # healthy VIO yields agree (2) or drift-correct (3), never zero-velocity
    assert all(m in (0, 1, 2, 3) for m in modes), modes
    assert modes.count(2) + modes.count(3) >= 6, modes
    ate, _ = align_umeyama_4dof(est.trajectory, gt)
    assert ate < 0.3, ate


def test_vil_zero_velocity_mode_on_stationary():
    traj = SyntheticTrajectory(duration=6.0, w_amp=(0.0, 0.0, 0.0),
                               p_amp=(0.0, 0.0, 0.0), lin_vel=(0.0, 0.0, 0.0))
    box = BoxWorld()
    cfg = make_vil_cfg()
    est = VIOEstimator(cfg)
    est.enable_lidar()
    # hand-build a full window of stationary frames
    est.status = VIOEstimator.NON_LINEAR
    est.times = [0.5 + 0.1 * k for k in range(est.W)]
    modes = []
    for tl in (0.62, 0.82):
        sweep = simulate_sweep(box, traj, tl, n_azimuth=360)
        out = est.process_lidar(sweep["t_start"], sweep["pts"],
                                sweep["rel_time"], sweep["mask"])
        if out is not None:
            modes.append(out["mode"])
    assert modes and modes[-1] == 4, modes
