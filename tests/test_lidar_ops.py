import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, _quat_to_mat
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
from mvil_fusion_tpu.ops import deskew, vgicp, voxel
from mvil_fusion_tpu.utils import lie

TRAJ = SyntheticTrajectory(duration=4.0, w_amp=(0.3, 0.25, 0.6),
                           w_freq=(0.3, 0.25, 0.35),
                           p_amp=(1.0, 0.9, 0.3), p_freq=(0.3, 0.37, 0.21),
                           lin_vel=(0.6, 0.3, 0.0))
WORLD = BoxWorld()


# ---------------------------------------------------------------------------
# voxel ops
# ---------------------------------------------------------------------------

def test_voxel_downsample_centroids(rng):
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    res = voxel.voxel_downsample(jnp.asarray(pts),
                                 jnp.ones(2000, bool), 1.0, 1024)
    out = np.asarray(res.pts)[np.asarray(res.mask)]
    assert 100 < len(out) < 1400
    # every centroid lies inside its voxel
    cell = np.floor(out)
    assert (out >= cell - 1e-5).all() and (out <= cell + 1 + 1e-5).all()
    # padding invariance
    pts_pad = np.concatenate([pts, np.full((100, 3), 1e3, np.float32)])
    mask = np.concatenate([np.ones(2000, bool), np.zeros(100, bool)])
    res2 = voxel.voxel_downsample(jnp.asarray(pts_pad), jnp.asarray(mask),
                                  1.0, 1024)
    out2 = np.asarray(res2.pts)[np.asarray(res2.mask)]
    assert len(out2) == len(out)


def test_gaussian_voxel_map_stats(rng):
    # plane at z=0 with noise: voxel covariances should be flat in z
    pts = np.zeros((5000, 3), np.float32)
    pts[:, 0] = rng.uniform(0, 4, 5000)
    pts[:, 1] = rng.uniform(0, 4, 5000)
    pts[:, 2] = rng.normal(scale=0.01, size=5000)
    vm = voxel.build_gaussian_voxel_map(jnp.asarray(pts),
                                        jnp.ones(5000, bool), 1.0)
    mean, cov, hit = voxel.lookup(vm, jnp.asarray([[0.5, 0.5, 0.0]],
                                                  jnp.float32))
    assert bool(hit[0])
    c = np.asarray(cov[0])
    assert c[2, 2] < 0.1 * c[0, 0]  # flat in z
    np.testing.assert_allclose(float(mean[0][2]), 0.0, atol=0.02)
    # miss: empty region
    _, _, hit2 = voxel.lookup(vm, jnp.asarray([[100.0, 100.0, 100.0]],
                                              jnp.float32))
    assert not bool(hit2[0])


# ---------------------------------------------------------------------------
# deskew
# ---------------------------------------------------------------------------

def test_deskew_recovers_end_frame():
    sweep = simulate_sweep(WORLD, TRAJ, t_start=1.0)
    p0, q0 = TRAJ.pose_at(sweep["t_start"])
    p1, q1 = TRAJ.pose_at(sweep["t_end"])
    out = deskew.deskew_to_end(
        jnp.asarray(sweep["pts"]), jnp.asarray(sweep["rel_time"]),
        jnp.asarray(p0, jnp.float32), jnp.asarray(q0, jnp.float32),
        jnp.asarray(p1, jnp.float32), jnp.asarray(q1, jnp.float32), 0.1)
    m = sweep["mask"]
    err = np.linalg.norm(np.asarray(out)[m] - sweep["pts_true_end"][m],
                         axis=1)
    # slerp (constant-rate) vs true time-varying motion over 0.1 s: cm-level
    # at 10 m range (the reference's slerp deskew has the same model error)
    assert np.percentile(err, 95) < 0.03, np.percentile(err, 95)
    # distortion without deskew is much larger
    raw_err = np.linalg.norm(sweep["pts"][m] - sweep["pts_true_end"][m],
                             axis=1)
    assert raw_err.mean() > 5 * err.mean()


def test_ring_and_time():
    sweep = simulate_sweep(WORLD, TRAJ, t_start=0.5)
    ring, rel, ok = deskew.ring_and_time(jnp.asarray(sweep["pts"]), 16, 0.1)
    m = sweep["mask"]
    ring_err = np.abs(np.asarray(ring)[m] - sweep["ring"][m])
    assert (ring_err == 0).mean() > 0.95
    rel_err = np.abs(np.asarray(rel)[m] - sweep["rel_time"][m])
    # azimuth→time mapping matches the simulator's
    assert np.percentile(rel_err, 90) < 0.005


# ---------------------------------------------------------------------------
# VGICP
# ---------------------------------------------------------------------------

def _two_sweeps(dt_between=0.2):
    s0 = simulate_sweep(WORLD, TRAJ, t_start=1.0)
    s1 = simulate_sweep(WORLD, TRAJ, t_start=1.0 + dt_between)
    # deskew both to their end frames using ground-truth poses
    out = []
    for s in (s0, s1):
        p0, q0 = TRAJ.pose_at(s["t_start"])
        p1, q1 = TRAJ.pose_at(s["t_end"])
        pts = deskew.deskew_to_end(
            jnp.asarray(s["pts"]), jnp.asarray(s["rel_time"]),
            jnp.asarray(p0, jnp.float32), jnp.asarray(q0, jnp.float32),
            jnp.asarray(p1, jnp.float32), jnp.asarray(q1, jnp.float32), 0.1)
        out.append((pts, jnp.asarray(s["mask"]), (p1, q1)))
    return out


def test_vgicp_recovers_relative_pose():
    (tgt, tgt_m, (p_t, q_t)), (src, src_m, (p_s, q_s)) = _two_sweeps()
    # true relative: target_frame ← source_frame
    R_t = _quat_to_mat(q_t)
    R_s = _quat_to_mat(q_s)
    R_rel = R_t.T @ R_s
    t_rel = R_t.T @ (p_s - p_t)

    tgt_map = voxel.build_gaussian_voxel_map(tgt, tgt_m, 0.5)
    src_map = voxel.build_gaussian_voxel_map(src, src_m, 0.5)
    # slightly perturbed init
    q_init = lie.quat_boxplus(lie.mat_to_quat(jnp.asarray(
        R_rel, jnp.float32)), jnp.asarray([0.03, -0.02, 0.04]))
    p_init = jnp.asarray(t_rel, jnp.float32) + jnp.asarray([0.1, -0.08, 0.05])
    res = vgicp.vgicp_align(src, src_m, tgt_map, src_map, p_init, q_init,
                            iters=12)
    assert int(res.n_corr) > 2000
    t_err = np.linalg.norm(np.asarray(res.p) - t_rel)
    r_err = np.linalg.norm(np.asarray(lie.quat_boxminus(
        res.q, lie.mat_to_quat(jnp.asarray(R_rel, jnp.float32)))))
    assert t_err < 0.05, t_err
    assert r_err < 0.02, r_err
    # fitness is point-to-voxel-mean msd: floor ≈ in-voxel variance (~0.06
    # at leaf 0.5) even at perfect alignment — gates must be calibrated to
    # this metric, not pcl's point-to-point score
    assert float(res.fitness) < 0.15


def test_vgicp_identity_when_same_cloud():
    (tgt, tgt_m, _), _ = _two_sweeps()
    tgt_map = voxel.build_gaussian_voxel_map(tgt, tgt_m, 0.5)
    res = vgicp.vgicp_align(tgt, tgt_m, tgt_map, tgt_map,
                            jnp.zeros(3), lie.quat_identity(), iters=6)
    assert np.linalg.norm(np.asarray(res.p)) < 1e-3
    # fitness floor = in-voxel variance (see note above)
    assert float(res.fitness) < 0.08
