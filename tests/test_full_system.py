"""Full-system smoke test: camera features + IMU + LiDAR through the whole
pipeline (tracker bypassed; features injected directly) — config 3 of
BASELINE.json at reduced scale."""

import numpy as np
import pytest
import jax.numpy as jnp

from mvil_fusion_tpu.config import LidarConfig, LocalMappingConfig, SystemConfig
from mvil_fusion_tpu.estimator.vio import VIOEstimator
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
from mvil_fusion_tpu.pipeline.system import VilSystem

pytestmark = pytest.mark.slow  # full e2e ladder; fast subset: -m 'not slow'

from test_vio_e2e import align_umeyama_4dof, make_cfg as make_mono_cfg


def make_cfg():
    base = make_mono_cfg()
    return base.replace(
        lidar=LidarConfig(rlb=(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0),
                          tlb=(0.0, 0.0, 0.0), vgicp_iters=8),
        local_mapping=LocalMappingConfig(submap_trigger_dist=1.0,
                                         submap_trigger_frames=8))


def test_full_system_end_to_end(rng):
    traj = SyntheticTrajectory(duration=7.0, w_amp=(0.5, 0.45, 0.55),
                               w_freq=(0.4, 0.33, 0.47),
                               p_amp=(1.2, 1.0, 0.4),
                               p_freq=(0.33, 0.41, 0.23))
    world = SyntheticWorld(traj=traj, n_landmarks=500, landmark_radius=8.0)
    box = BoxWorld()
    cfg = make_cfg()
    sys_ = VilSystem(cfg, use_tracker=False, enable_mapping=True)

    frame_times = np.arange(0.5, 5.2, 0.1)
    lidar_times = np.arange(1.35, 4.8, 0.2)
    li = 0
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
            sys_.process_imu(ts[k], acc[k], gyr[k])
        uv, norm, z, vis = world.project(t, ric, tic)
        ids = np.nonzero(vis)[0][:150]
        n = norm[ids] + rng.normal(scale=0.3 / 460.0, size=(len(ids), 2))
        vel = np.zeros((len(ids), 2), np.float32)
        if prev_t is not None:
            for j, fid in enumerate(ids):
                if fid in prev_norm:
                    vel[j] = (n[j] - prev_norm[fid]) / (t - prev_t)
        prev_norm = {fid: n[j] for j, fid in enumerate(ids)}
        prev_t = t
        sys_.process_features(t, ids, n.astype(np.float32), vel)
        gt.append((t, *traj.state_at(t)))
        while (li < len(lidar_times) and lidar_times[li] + 0.1 <= t
               and sys_.estimator.status == VIOEstimator.NON_LINEAR):
            sweep = simulate_sweep(box, traj, lidar_times[li], n_azimuth=360)
            sys_.process_lidar(sweep["t_start"], sweep["pts"],
                               sweep["mask"])
            li += 1

    est = sys_.estimator
    assert est.status == VIOEstimator.NON_LINEAR
    assert est.failures == 0
    # all three stages produced trajectories
    assert len(sys_.frontend_trajectory()) > 25
    assert len(sys_.midend_trajectory()) > 5
    assert len(sys_.backend_trajectory()) >= 1
    # lidar depth feedback reached the feature stream
    assert len(sys_.depth_register.clouds) >= 1
    # VIO accuracy with all couplings active
    ate, _ = align_umeyama_4dof(est.trajectory, gt)
    assert ate < 0.3, ate
    # result files
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        sys_.save_results(d + "/")
        for name in ("Frontend.txt", "Midend.txt", "Backend.txt"):
            path = os.path.join(d, name)
            assert os.path.exists(path)
            assert len(open(path).readlines()) >= 1
