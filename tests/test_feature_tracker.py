import numpy as np
import jax.numpy as jnp

from mvil_fusion_tpu.config import SystemConfig, TrackerConfig, CameraConfig
from mvil_fusion_tpu.frontend.feature_tracker import FeatureTracker
from mvil_fusion_tpu.ops import image as im


def make_cfg(**tk):
    base = dict(max_cnt=80, min_dist=16, freq=0, equalize=False,
                pyramid_levels=2, max_iters=8, ransac_iters=64,
                max_features_pad=128)
    base.update(tk)
    return SystemConfig(
        camera=CameraConfig(width=320, height=240, fx=200.0, fy=200.0,
                            cx=160.0, cy=120.0, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(**base))


def texture(rng, H=240, W=320):
    from scipy.signal import convolve2d
    base = rng.uniform(0, 255, size=(H // 8, W // 8))
    img = np.kron(base, np.ones((8, 8)))
    return convolve2d(img, np.ones((5, 5)) / 25, mode="same",
                      boundary="symm").astype(np.float32)


def shift_img(img, dx, dy):
    H, W = img.shape
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    pos = np.stack([xx - dx, yy - dy], axis=-1)
    return np.asarray(im.bilinear_sample(jnp.asarray(img), jnp.asarray(pos)))


def test_tracker_initializes_and_tracks(rng):
    cfg = make_cfg()
    tr = FeatureTracker(cfg)
    img0 = texture(rng)
    f0 = tr.process(0.0, img0)
    assert f0 is not None
    n0 = int(f0.valid.sum())
    assert 40 <= n0 <= cfg.tracker.max_cnt

    img1 = shift_img(img0, 3.0, -2.0)
    f1 = tr.process(0.1, img1)
    survived = (f1.track_cnt > 1) & f1.valid
    assert survived.sum() > 0.7 * n0
    # ids stable for survivors, positions shifted by (3,-2)
    common = np.intersect1d(f0.ids[f0.valid], f1.ids[survived])
    assert len(common) > 0.6 * n0
    d = []
    for i in common[:30]:
        p0 = f0.uv[f0.ids == i][0]
        p1 = f1.uv[f1.ids == i][0]
        d.append(p1 - p0)
    d = np.asarray(d)
    np.testing.assert_allclose(d.mean(axis=0), [3.0, -2.0], atol=0.3)


def test_tracker_velocity(rng):
    cfg = make_cfg()
    tr = FeatureTracker(cfg)
    img0 = texture(rng)
    tr.process(0.0, img0)
    f1 = tr.process(0.1, shift_img(img0, 2.0, 0.0))
    sur = f1.valid & (f1.track_cnt > 1)
    # dx=2px over 0.1s at fx=200 → normalized vx ≈ 0.1
    vx = f1.vel[sur, 0]
    np.testing.assert_allclose(vx.mean(), 0.1, atol=0.02)


def test_tracker_restart_on_gap(rng):
    cfg = make_cfg()
    tr = FeatureTracker(cfg)
    img0 = texture(rng)
    f0 = tr.process(0.0, img0)
    f1 = tr.process(5.0, img0)  # 5 s gap → restart
    assert f1 is not None
    assert (f1.track_cnt[f1.valid] == 1).all()
    # ids were re-issued
    assert len(np.intersect1d(f0.ids[f0.valid], f1.ids[f1.valid])) == 0


def test_tracker_freq_gating(rng):
    cfg = make_cfg(freq=10)
    tr = FeatureTracker(cfg)
    img = texture(rng)
    published = 0
    for k in range(30):  # 30 Hz input for 1 s
        if tr.process(k / 30.0, img) is not None:
            published += 1
    assert published <= 13, published
    assert published >= 8, published


def test_tracker_refills_after_loss(rng):
    cfg = make_cfg()
    tr = FeatureTracker(cfg)
    img0 = texture(rng)
    tr.process(0.0, img0)
    # radically different image → most tracks lost, refill happens
    img2 = texture(np.random.default_rng(99))
    f2 = tr.process(0.1, img2)
    assert int(f2.valid.sum()) >= 0.5 * cfg.tracker.max_cnt
