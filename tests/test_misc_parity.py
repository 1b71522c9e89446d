"""Small parity components: Scaramuzza model, IMU-rate prediction, viz."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from mvil_fusion_tpu.frontend import camera as cam
from mvil_fusion_tpu.utils import viz
from mvil_fusion_tpu.estimator.vio import VIOEstimator

from test_vio_e2e import make_cfg, make_world
from test_checkpoint import drive


def test_scaramuzza_roundtrip(rng):
    c = cam.Scaramuzza(cx=320.0, cy=240.0,
                       poly=(-250.0, 0.0, 8e-4, -3e-7), c=1.001, d=1e-4,
                       e=-1e-4)
    pts = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 6.0, size=64)
    uv = c.space_to_plane(jnp.asarray(pts))
    xy = c.lift_projective(uv)
    xy_true = pts[:, :2] / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(xy), xy_true, atol=2e-3)


@pytest.mark.slow
def test_predict_latest_tracks_truth():
    world = make_world(duration=6.0)
    cfg = make_cfg()
    est = VIOEstimator(cfg)
    rng = np.random.default_rng(0)
    drive(est, world, cfg, 0.5, 2.4, rng)
    assert est.status == VIOEstimator.NON_LINEAR
    # feed extra IMU beyond the last frame, then predict
    traj = world.traj
    acc, gyr, dt, ts = traj.imu_sequence(2.4 + 1e-9, 2.48, 200.0)
    for k in range(len(ts)):
        est.process_imu(ts[k], acc[k], gyr[k])
    t, p, q, v = est.predict_latest()
    assert abs(t - 2.48) < 6e-3
    # the VIO world frame carries mono gauge offset vs ground truth, so
    # validate the RELATIVE prediction: displacement magnitude over the
    # 80 ms horizon must match the true displacement magnitude, and the
    # predicted speed the true speed.
    k = est.W - 1
    p0 = np.asarray(est.state.p[k])
    pg0 = traj.state_at(est.times[-1])[0]
    pg1, _, vg1 = traj.state_at(t)
    d_est = np.linalg.norm(p - p0)
    d_gt = np.linalg.norm(pg1 - pg0)
    assert abs(d_est - d_gt) < 0.05, (d_est, d_gt)
    assert abs(np.linalg.norm(v) - np.linalg.norm(vg1)) < 0.3


def test_viz_outputs(rng):
    rows = [(0.1 * k, np.asarray([np.cos(k * 0.2), np.sin(k * 0.2), 0.0]),
             np.asarray([1, 0, 0, 0])) for k in range(30)]
    pts = rng.uniform(-5, 5, size=(2000, 3))
    with tempfile.TemporaryDirectory() as d:
        p1 = os.path.join(d, "traj.png")
        viz.plot_trajectories(p1, {"frontend": rows}, gt=rows,
                              modes=[(0.5, 0.5, 2), (1.0, 0.2, 4)])
        p2 = os.path.join(d, "map.png")
        viz.plot_map(p2, pts, traj=rows)
        assert os.path.getsize(p1) > 10000
        assert os.path.getsize(p2) > 10000
