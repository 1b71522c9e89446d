"""Rosbag v2.0 ingestion: write a synthetic VIL bag, read it back, and feed
it through the full system (the reference's `rosbag play` workflow,
README.md:44-57, without ROS)."""

import os
import tempfile

import numpy as np
import pytest

from mvil_fusion_tpu.io import rosbag as rb
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep


def make_bag(path, duration=2.0, rng=None):
    traj = SyntheticTrajectory(duration=duration + 1.0)
    box = BoxWorld()
    w = rb.BagWriter(path)
    w.add_connection("/imu", "sensor_msgs/Imu")
    w.add_connection("/image", "sensor_msgs/Image")
    w.add_connection("/points", "sensor_msgs/PointCloud2")
    acc, gyr, dts, ts = traj.imu_sequence(0.5, 0.5 + duration, 200.0)
    for k in range(len(ts)):
        w.write("/imu", ts[k], rb.encode_imu(ts[k], acc[k], gyr[k]))
    rng = rng or np.random.default_rng(0)
    img_times = np.arange(0.5, 0.5 + duration, 0.1)
    for t in img_times:
        img = rng.uniform(0, 255, size=(48, 64)).astype(np.float32)
        w.write("/image", t, rb.encode_image(t, img))
    sweep = simulate_sweep(box, traj, 0.9, n_azimuth=180)
    inten = sweep["ring"].astype(np.float32) + sweep["rel_time"]
    w.write("/points", 0.9,
            rb.encode_pointcloud2(0.9, sweep["pts"], inten))
    w.close()
    return acc, gyr, ts, img_times, sweep


def test_bag_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.bag")
        acc, gyr, ts, img_times, sweep = make_bag(path)
        kinds = {"imu": 0, "image": 0, "lidar": 0}
        first_imu = None
        lidar_pts = None
        for kind, t, payload in rb.play(path, "/imu", "/image", "/points"):
            kinds[kind] += 1
            if kind == "imu" and first_imu is None:
                first_imu = (t, payload)
            if kind == "lidar":
                lidar_pts = payload[0]
        assert kinds["imu"] == len(ts)
        assert kinds["image"] == len(img_times)
        assert kinds["lidar"] == 1
        t0, (acc0, gyr0) = first_imu
        np.testing.assert_allclose(t0, ts[0], atol=1e-6)
        np.testing.assert_allclose(acc0, acc[0], atol=1e-9)
        np.testing.assert_allclose(gyr0, gyr[0], atol=1e-9)
        # point cloud fields round-trip
        pts = lidar_pts["pts"]
        np.testing.assert_allclose(pts, sweep["pts"], atol=1e-6)
        enc_ring = np.floor(lidar_pts["intensity"]).astype(int)
        np.testing.assert_array_equal(enc_ring, sweep["ring"])


def test_bag_time_ordering_and_topic_filter():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.bag")
        make_bag(path, duration=1.0)
        times = [t for (_, t, _) in rb.play(path, "/imu", "/image",
                                            "/points")]
        assert all(times[i] <= times[i + 1] + 1e-9
                   for i in range(len(times) - 1))
        # topic filter: only imu
        reader = rb.BagReader(path)
        msgs = list(reader.messages(topics={"/imu"}))
        assert all(m.topic == "/imu" for m in msgs)
        assert len(msgs) > 100


@pytest.mark.slow
def test_bag_feeds_estimator():
    """bag → play() → VIOEstimator runs and initializes (mono)."""
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    from test_vio_e2e import make_cfg

    world = SyntheticWorld(
        traj=SyntheticTrajectory(duration=4.0, w_amp=(0.5, 0.45, 0.55),
                                 w_freq=(0.4, 0.33, 0.47),
                                 p_amp=(1.2, 1.0, 0.4),
                                 p_freq=(0.33, 0.41, 0.23)),
        n_landmarks=500, landmark_radius=8.0)
    traj = world.traj
    ric = np.eye(3)
    tic = np.zeros(3)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vio.bag")
        w = rb.BagWriter(path)
        w.add_connection("/imu", "sensor_msgs/Imu")
        w.add_connection("/image", "sensor_msgs/Image")
        acc, gyr, dts, ts = traj.imu_sequence(0.4, 2.6, 200.0)
        for k in range(len(ts)):
            w.write("/imu", ts[k], rb.encode_imu(ts[k], acc[k], gyr[k]))
        for t in np.arange(0.5, 2.5, 0.1):
            img = np.zeros((2, 2), np.float32)   # placeholder; features fed
            w.write("/image", t, rb.encode_image(t, img))
        w.close()

        est = VIOEstimator(make_cfg())
        prev_norm = {}
        prev_t = None
        for kind, t, payload in rb.play(path, "/imu", "/image", "/none"):
            if kind == "imu":
                est.process_imu(t, payload[0], payload[1])
            else:
                # the tracker is exercised elsewhere; substitute its output
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
        assert len(est.trajectory) > 5
