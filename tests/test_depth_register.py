import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.frontend.depth_register import DepthRegister
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld


def test_depth_register_recovers_feature_depth(rng):
    box = BoxWorld()
    cfg = SystemConfig()
    reg = DepthRegister(cfg)

    # camera at origin looking +z (world = camera frame here)
    p_wc = np.zeros(3)
    q_wc = np.asarray([1.0, 0, 0, 0])

    # dense world cloud from ray casting (the "lidar map")
    dirs = rng.normal(size=(20000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = box.ray_range(p_wc, dirs)
    ok = r < 60
    reg.add_cloud(0.0, (dirs * r[:, None])[ok])

    # features: pick random forward directions, ground-truth depth = z of hit
    fd = rng.normal(size=(64, 3))
    fd[:, 2] = np.abs(fd[:, 2]) + 1.0
    fd /= np.linalg.norm(fd, axis=1, keepdims=True)
    fr = box.ray_range(p_wc, fd)
    pts = fd * fr[:, None]
    norm = pts[:, :2] / pts[:, 2:3]
    valid = np.ones(64, bool)

    depth = reg.get_depth(0.05, norm.astype(np.float32), valid, p_wc, q_wc)
    got = depth > 0
    assert got.sum() > 30, got.sum()
    # registered depth (range) matches the true ray range
    err = np.abs(depth[got] - fr[got])
    assert np.median(err) < 0.2, np.median(err)
    # depths below the 3 m gate are rejected
    near = fr < 3.0
    if near.any():
        assert (depth[near] < 0).all()


def test_depth_register_empty_and_expiry(rng):
    cfg = SystemConfig()
    reg = DepthRegister(cfg, window_sec=1.0)
    norm = rng.normal(size=(8, 2)).astype(np.float32) * 0.1
    d = reg.get_depth(0.0, norm, np.ones(8, bool), np.zeros(3),
                      np.asarray([1.0, 0, 0, 0]))
    assert (d < 0).all()
    reg.add_cloud(0.0, rng.uniform(3, 10, size=(100, 3)).astype(np.float32))
    reg.add_cloud(5.0, rng.uniform(3, 10, size=(100, 3)).astype(np.float32))
    assert len(reg.clouds) == 1  # old cloud expired
