import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, _quat_to_mat
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
from mvil_fusion_tpu.mapping.local_mapping import LocalMapper
from mvil_fusion_tpu.ops import deskew, loam_features as lfe, loam_icp
from mvil_fusion_tpu.utils import lie

TRAJ = SyntheticTrajectory(duration=8.0, w_amp=(0.2, 0.15, 0.4),
                           w_freq=(0.2, 0.15, 0.25),
                           p_amp=(1.5, 1.2, 0.3), p_freq=(0.2, 0.25, 0.15),
                           lin_vel=(0.5, 0.25, 0.0))
BOX = BoxWorld()


def sweep_features(t0, n_azimuth=720):
    """Deskewed sweep → organized grid → LOAM features (sensor frame)."""
    s = simulate_sweep(BOX, TRAJ, t0, n_azimuth=n_azimuth)
    p0, q0 = TRAJ.pose_at(s["t_start"])
    p1, q1 = TRAJ.pose_at(s["t_end"])
    pts = deskew.deskew_to_end(
        jnp.asarray(s["pts"]), jnp.asarray(s["rel_time"]),
        jnp.asarray(p0, jnp.float32), jnp.asarray(q0, jnp.float32),
        jnp.asarray(p1, jnp.float32), jnp.asarray(q1, jnp.float32), 0.1)
    grid, occ, _ = lfe.organize_grid(pts, jnp.asarray(s["ring"]),
                                  jnp.asarray(s["rel_time"]),
                                  jnp.asarray(s["mask"]), 16, n_azimuth, 0.1)
    feats = lfe.extract(grid, occ)
    return feats, (np.asarray(p1), np.asarray(q1))


def wall_distance(pts_w):
    """Distance of world points to the nearest box surface."""
    half = np.asarray(BOX.room) / 2
    d_wall = np.min(np.abs(np.abs(pts_w) - half[None, :]), axis=1)
    ds = [d_wall]
    for (c, h) in BOX.boxes:
        q = np.abs(pts_w - np.asarray(c)) - np.asarray(h)
        # distance to box surface (outside or inside)
        outside = np.linalg.norm(np.maximum(q, 0), axis=1)
        inside = np.abs(np.minimum(np.max(q, axis=1), 0))
        ds.append(np.minimum(outside + inside, np.abs(outside - 0)))
    return np.min(np.stack(ds), axis=0)


def test_loam_feature_extraction():
    feats, (p, q) = sweep_features(1.0)
    n_sharp = int(np.asarray(feats.sharp_mask).sum())
    n_flat = int(np.asarray(feats.flat_mask).sum())
    n_lf = int(np.asarray(feats.less_flat_mask).sum())
    assert n_sharp > 10, n_sharp
    assert n_flat > 50, n_flat
    assert n_lf > 400, n_lf
    # flat points lie on surfaces
    R = _quat_to_mat(q)
    fm = np.asarray(feats.flat_mask)
    flat_w = np.asarray(feats.flat)[fm] @ R.T + p
    d = wall_distance(flat_w)
    assert np.percentile(d, 90) < 0.1, np.percentile(d, 90)


def test_scan_to_map_recovers_pose():
    f0, (p0, q0) = sweep_features(1.0)
    f1, (p1, q1) = sweep_features(1.6)
    # map = sweep-0 features in world frame
    def to_world(pts, p, q):
        return np.asarray(pts) @ _quat_to_mat(q).T + p
    cmap = jnp.asarray(to_world(f0.less_sharp, p0, q0))
    smap = jnp.asarray(to_world(f0.less_flat, p0, q0))
    # perturbed init of sweep-1 pose
    q_init = lie.quat_boxplus(jnp.asarray(q1, jnp.float32),
                              jnp.asarray([0.02, -0.03, 0.04]))
    p_init = jnp.asarray(p1, jnp.float32) + jnp.asarray([0.15, -0.1, 0.08])
    p_est, q_est, n_e, n_p, res = loam_icp.scan_to_map(
        jnp.asarray(f1.sharp), jnp.asarray(f1.sharp_mask),
        jnp.asarray(f1.less_flat), jnp.asarray(f1.less_flat_mask),
        cmap, jnp.asarray(f0.less_sharp_mask),
        smap, jnp.asarray(f0.less_flat_mask),
        p_init, q_init, outer_iters=3, gn_iters=4)
    assert int(n_p) > 200, int(n_p)
    p_err = np.linalg.norm(np.asarray(p_est) - p1)
    r_err = np.linalg.norm(np.asarray(
        lie.quat_boxminus(q_est, jnp.asarray(q1, jnp.float32))))
    assert p_err < 0.05, p_err
    assert r_err < 0.02, r_err


def test_local_mapper_corrects_drifting_odometry():
    cfg = SystemConfig()
    mapper = LocalMapper(cfg)
    rng = np.random.default_rng(0)
    drift = np.zeros(3)
    n_sub = 0
    errs = []
    for k, t0 in enumerate(np.arange(0.8, 3.2, 0.12)):
        feats, (p_true, q_true) = sweep_features(t0, n_azimuth=480)
        # odometry input = truth + accumulating drift
        drift += rng.normal(scale=0.004, size=3)
        p_odom = p_true + drift
        q_odom = q_true
        sm = mapper.process(t0, feats.sharp, feats.sharp_mask,
                            feats.less_flat, feats.less_flat_mask,
                            p_odom.astype(np.float32),
                            q_odom.astype(np.float32))
        if sm is not None:
            n_sub += 1
        t, p_est, q_est = mapper.trajectory[-1]
        errs.append(np.linalg.norm(p_est - p_true))
    errs = np.asarray(errs)
    # mapping bounds the error despite odometry drift (cm-scale registration
    # bias on the sparse striped synthetic scans is expected; long-term
    # consistency belongs to the global back end)
    assert errs[-1] < 0.2, errs[-1]
    assert errs.max() < 0.25, errs.max()
    assert n_sub >= 1
    assert mapper.submaps_emitted == n_sub
