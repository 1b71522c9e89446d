import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.estimator import initialization as init
from mvil_fusion_tpu.io.synthetic import (SyntheticTrajectory, SyntheticWorld,
                                          _quat_mul, _quat_to_mat)
from mvil_fusion_tpu.ops import preintegration as pre
from mvil_fusion_tpu.utils import lie

from helpers import build_window_problem

TRAJ = SyntheticTrajectory(duration=8.0, w_amp=(0.9, 0.8, 1.0),
                           w_freq=(0.5, 0.4, 0.6))
WORLD = SyntheticWorld(traj=TRAJ, landmark_radius=8.0)
S_TRUE, FEATS, PREINTS, IMASK, TIMES = build_window_problem(WORLD)
W = 7


def camera_data():
    """Ground-truth camera poses in the c0 frame (identity extrinsics)."""
    ps, qs = [], []
    for t in TIMES:
        p, q = TRAJ.pose_at(t)
        ps.append(p), qs.append(q)
    ps, qs = np.asarray(ps, np.float32), np.asarray(qs, np.float32)
    # express in frame of camera 0
    R0 = _quat_to_mat(qs[0])
    q0c = qs[0].copy()
    q0c[1:] *= -1
    p_c0 = (ps - ps[0]) @ R0
    q_c0 = np.asarray([_quat_mul(q0c, qk) for qk in qs], np.float32)
    return p_c0.astype(np.float32), q_c0


def test_hand_eye_rotation():
    rng = np.random.default_rng(0)
    q_bc = np.asarray(lie.quat_exp(jnp.asarray([0.2, -0.1, 0.3],
                                               jnp.float32)))
    qb, qc = [], []
    for _ in range(20):
        phi = rng.normal(scale=0.4, size=3).astype(np.float32)
        q_b = np.asarray(lie.quat_exp(jnp.asarray(phi)))
        # q_c = q_bc^-1 ⊗ q_b ⊗ q_bc
        q_c = np.asarray(lie.quat_mul(lie.quat_mul(
            lie.quat_conj(jnp.asarray(q_bc)), jnp.asarray(q_b)),
            jnp.asarray(q_bc)))
        qb.append(q_b), qc.append(q_c)
    q_est = init.hand_eye_rotation(jnp.asarray(qb), jnp.asarray(qc))
    err = np.linalg.norm(np.asarray(
        lie.quat_boxminus(q_est, jnp.asarray(q_bc))))
    assert err < 1e-4, err


def test_essential_relative_pose():
    p_c0, q_c0 = camera_data()
    l, c = 0, W - 1
    obs = np.asarray(FEATS.obs)
    mask = np.asarray(FEATS.mask)
    sel = mask[:, l] & mask[:, c]
    res = init.essential_relative_pose(
        jax.random.PRNGKey(0), jnp.asarray(obs[:, l]), jnp.asarray(obs[:, c]),
        jnp.asarray(sel))
    assert bool(res.ok)
    # ground truth relative pose of frame c in frame l (camera frames)
    R_l = _quat_to_mat(q_c0[l])
    R_c = _quat_to_mat(q_c0[c])
    R_true = R_l.T @ R_c
    t_true = R_l.T @ (p_c0[c] - p_c0[l])
    t_true = t_true / np.linalg.norm(t_true)
    R_err = np.asarray(lie.so3_log(jnp.asarray(
        R_true.T @ np.asarray(res.R), jnp.float32)))
    assert np.linalg.norm(R_err) < 0.02, R_err
    t_est = np.asarray(res.t)
    assert min(np.linalg.norm(t_est - t_true),
               np.linalg.norm(t_est + t_true)) < 0.05


def test_global_sfm_recovers_geometry():
    p_c0, q_c0 = camera_data()
    obs = np.asarray(FEATS.obs)
    mask = np.asarray(FEATS.mask)
    l = 0
    sel = mask[:, l] & mask[:, W - 1]
    rel = init.essential_relative_pose(
        jax.random.PRNGKey(0), jnp.asarray(obs[:, l]),
        jnp.asarray(obs[:, W - 1]), jnp.asarray(sel))
    sfm = init.global_sfm(obs, mask, l, np.asarray(rel.R), np.asarray(rel.t))
    assert sfm.ok
    # compare up to scale: align by the distance l -> W-1
    scale_true = np.linalg.norm(p_c0[W - 1] - p_c0[l])
    p_est = sfm.p_c0_c * scale_true
    err = np.linalg.norm(p_est - p_c0, axis=1)
    assert err.max() < 0.1 * scale_true, err
    # rotations
    for k in range(W):
        dq = lie.quat_boxminus(jnp.asarray(sfm.q_c0_c[k]),
                               jnp.asarray(q_c0[k]))
        assert np.linalg.norm(np.asarray(dq)) < 0.05


def _sfm_body_quats(q_ric_true=None):
    """SfM camera rotations == body rotations for identity extrinsics."""
    p_c0, q_c0 = camera_data()
    return p_c0, q_c0


def test_solve_gyroscope_bias():
    bg_true = np.asarray([0.01, -0.02, 0.015], np.float32)
    s_true, feats, preints, imask, _ = build_window_problem(
        WORLD, bg_true=bg_true)
    # preints were integrated with zero linearization bias over biased gyro
    _, q_c0 = camera_data()
    bg = init.solve_gyroscope_bias(jnp.asarray(q_c0), preints, imask)
    np.testing.assert_allclose(np.asarray(bg), bg_true, atol=2e-3)


def test_stage_a_recovers_bias_and_ric():
    bg_true = np.asarray([0.01, -0.02, 0.015], np.float32)
    s_true, feats, preints, imask, _ = build_window_problem(
        WORLD, bg_true=bg_true)
    p_c0, q_c0 = camera_data()
    # raw first/last gyro of each interval
    gyr_first, gyr_last = [], []
    for k in range(W - 1):
        acc, gyr, dt, ts = TRAJ.imu_sequence(TIMES[k], TIMES[k + 1], 200.0,
                                             bg=bg_true)
        gyr_first.append(gyr[0])
        gyr_last.append(gyr[-1])
    res = init.estimate_ric_td_bg(
        jnp.asarray(q_c0), preints,
        jnp.asarray(np.asarray(gyr_first), jnp.float32),
        jnp.asarray(np.asarray(gyr_last), jnp.float32),
        lie.quat_identity())
    assert res.ok, res.cost
    # The (bgs, td) system is underdetermined per interval (the reference's
    # bounded Ceres solve shares this structure and only gates on cost), so
    # check functional rotation-consistency instead of parameter recovery:
    # corrected preintegrated Δq must match the camera relative rotation
    # through the estimated RIC.
    for k in range(W - 1):
        dq_corr = lie.quat_mul(
            jax.tree.map(lambda x: x[k], preints).dq,
            lie.quat_exp(jnp.asarray(preints.J[k, 3:6, 12:15])
                         @ res.bgs[k]))
        q_rel_cam = lie.quat_mul(lie.quat_conj(jnp.asarray(q_c0[k])),
                                 jnp.asarray(q_c0[k + 1]))
        # body relative = ric ⊗ cam relative ⊗ ric⁻¹
        q_rel_body = lie.quat_mul(lie.quat_mul(res.q_ric, q_rel_cam),
                                  lie.quat_conj(res.q_ric))
        ang = np.linalg.norm(np.asarray(
            lie.quat_boxminus(q_rel_body, dq_corr)))
        assert ang < 5e-3, (k, ang)
    # identity extrinsics recovered (strongly observable with rotation-rich
    # motion, unlike the bias/td split)
    assert np.linalg.norm(np.asarray(lie.quat_log(res.q_ric))) < 0.05
    assert np.abs(np.asarray(res.td)).max() <= 0.1 + 1e-6


def g_true_in_c0():
    _, qs0 = TRAJ.pose_at(TIMES[0])
    R_w_c0 = _quat_to_mat(qs0)
    return R_w_c0.T @ np.asarray([0, 0, TRAJ.g_norm])


def test_linear_alignment_recovers_scale_gravity_velocity():
    p_c0, q_c0 = camera_data()
    scale_true = 2.5
    p_scaled = p_c0 / scale_true      # SfM yields unscaled positions
    res = init.linear_alignment(jnp.asarray(p_scaled), jnp.asarray(q_c0),
                                PREINTS, TRAJ.g_norm,
                                jnp.zeros(3, jnp.float32))
    assert res.ok, res.cost
    np.testing.assert_allclose(float(res.scale), scale_true, rtol=0.02)
    np.testing.assert_allclose(np.asarray(res.g_c0), g_true_in_c0(),
                               atol=0.1)
    for k in range(W):
        pw, qw, vw = TRAJ.state_at(TIMES[k])
        v_body = _quat_to_mat(qw).T @ vw
        np.testing.assert_allclose(np.asarray(res.vel[k]), v_body, atol=0.05)


def test_stage_b_reference_parity_behavior():
    """Stage B (the reference's novel per-frame-scale solve) is an
    underdetermined system (49 unknowns, 36 residuals) that the reference
    gates only on final cost; verify our projected-LM finds a consistent
    (low-cost) solution with positive scales and bounded biases."""
    p_c0, q_c0 = camera_data()
    p_scaled = p_c0 / 2.5
    res = init.estimate_vel_g_s_tic(
        jnp.asarray(p_scaled), jnp.asarray(q_c0), PREINTS,
        TRAJ.g_norm, jnp.zeros(3, jnp.float32),
        jnp.asarray([-0.1, -0.1, -0.1]), jnp.asarray([0.1, 0.1, 0.1]),
        fix_pbc=True)
    assert res.ok, res.cost
    assert (np.asarray(res.scale) >= 0.0).all()
    assert np.abs(np.asarray(res.bas)).max() <= 0.2 + 1e-6
    assert np.isfinite(np.asarray(res.g_c0)).all()
