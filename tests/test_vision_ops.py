import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.frontend import camera as cam
from mvil_fusion_tpu.ops import corners, image as im, klt, ransac


def make_texture(rng, H=240, W=320):
    """Smooth random texture with strong gradients."""
    base = rng.uniform(0, 255, size=(H // 8, W // 8))
    img = np.kron(base, np.ones((8, 8)))
    # smooth
    k = np.ones((5, 5)) / 25
    from scipy.signal import convolve2d
    img = convolve2d(img, k, mode="same", boundary="symm")
    return img.astype(np.float32)


# ---------------------------------------------------------------------------
# camera models
# ---------------------------------------------------------------------------

def test_pinhole_roundtrip(rng):
    c = cam.PinholeRadtan(fx=356.37, fy=354.92, cx=326.88, cy=250.94,
                          k1=-0.293, k2=0.075, p1=0.00028, p2=-0.00027)
    pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 10.0, size=100)
    uv = c.space_to_plane(jnp.asarray(pts))
    xy = c.lift_projective(uv)
    xy_true = pts[:, :2] / pts[:, 2:3]
    keep = np.linalg.norm(xy_true, axis=-1) < 0.5  # inside distortion validity
    np.testing.assert_allclose(np.asarray(xy)[keep], xy_true[keep], atol=1e-4)


def test_equidistant_roundtrip(rng):
    c = cam.Equidistant(fx=300.0, fy=300.0, cx=320.0, cy=240.0,
                        k2=0.01, k3=-0.002, k4=0.0005, k5=0.0)
    pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 5.0, size=50)
    uv = c.space_to_plane(jnp.asarray(pts))
    xy = c.lift_projective(uv)
    xy_true = pts[:, :2] / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(xy), xy_true, atol=1e-3)


def test_mei_roundtrip(rng):
    c = cam.Mei(xi=0.8, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                k1=-0.1, k2=0.02)
    pts = rng.uniform(-0.5, 0.5, size=(50, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.5, 5.0, size=50)
    uv = c.space_to_plane(jnp.asarray(pts))
    xy = c.lift_projective(uv)
    xy_true = pts[:, :2] / pts[:, 2:3]
    np.testing.assert_allclose(np.asarray(xy), xy_true, atol=2e-3)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

def test_clahe_improves_contrast(rng):
    # low-contrast image: values squeezed into [100, 140]
    img = make_texture(rng)
    img = 100.0 + (img / 255.0) * 40.0
    out = np.asarray(im.clahe(jnp.asarray(img)))
    assert out.std() > 1.5 * img.std()
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_clahe_monotone_per_tile(rng):
    img = make_texture(rng)
    out = np.asarray(im.clahe(jnp.asarray(img)))
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Shi-Tomasi + spacing
# ---------------------------------------------------------------------------

def test_corner_detection_finds_corners(rng):
    img = np.zeros((240, 320), np.float32)
    # white squares produce corners
    for (y, x) in [(60, 80), (60, 200), (150, 80), (150, 200), (100, 140)]:
        img[y:y + 30, x:x + 30] = 200.0
    existing = jnp.zeros((0, 2), jnp.float32)
    res = corners.detect(jnp.asarray(img), existing, jnp.zeros((0,), bool),
                         max_new=40, min_dist=15)
    pts = np.asarray(res.pts)[np.asarray(res.ok)]
    assert len(pts) >= 10  # squares have 4 corners each
    # every detected point is near a square corner
    sq_corners = []
    for (y, x) in [(60, 80), (60, 200), (150, 80), (150, 200), (100, 140)]:
        for dy in (0, 30):
            for dx in (0, 30):
                sq_corners.append((x + dx, y + dy))
    sq_corners = np.asarray(sq_corners, np.float32)
    d = np.linalg.norm(pts[:, None, :] - sq_corners[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 4.0


def test_corner_min_dist_spacing(rng):
    img = jnp.asarray(make_texture(rng))
    res = corners.detect(img, jnp.zeros((0, 2), jnp.float32),
                         jnp.zeros((0,), bool), max_new=60, min_dist=20)
    pts = np.asarray(res.pts)[np.asarray(res.ok)]
    if len(pts) > 1:
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, 1e9)
        assert d.min() >= 20.0  # full min_dist circular constraint


def test_corner_avoids_existing(rng):
    img = jnp.asarray(make_texture(rng))
    first = corners.detect(img, jnp.zeros((0, 2), jnp.float32),
                           jnp.zeros((0,), bool), max_new=30, min_dist=20)
    ex = first.pts
    exv = first.ok
    second = corners.detect(img, ex, exv, max_new=30, min_dist=20)
    p1 = np.asarray(ex)[np.asarray(exv)]
    p2 = np.asarray(second.pts)[np.asarray(second.ok)]
    if len(p1) and len(p2):
        d = np.linalg.norm(p2[:, None] - p1[None, :], axis=-1)
        assert d.min() >= 20.0


# ---------------------------------------------------------------------------
# KLT
# ---------------------------------------------------------------------------

def test_klt_tracks_pure_translation(rng):
    img0 = make_texture(rng, 240, 320)
    shift = (6.0, -4.0)  # (dx, dy)
    # shift via roll (integer) for exactness
    img1 = np.roll(np.roll(img0, int(shift[1]), axis=0), int(shift[0]), axis=1)
    pyr0 = im.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = im.build_pyramid(jnp.asarray(img1), 3)
    pts = rng.uniform([40, 40], [280, 200], size=(50, 2)).astype(np.float32)
    res = klt.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(50, bool))
    ok = np.asarray(res.ok)
    assert ok.sum() > 30
    d = np.asarray(res.pts)[ok] - pts[ok]
    np.testing.assert_allclose(d.mean(axis=0), shift, atol=0.2)
    assert np.abs(d - np.asarray(shift)).max() < 1.0


def test_klt_subpixel_translation(rng):
    img0 = make_texture(rng, 240, 320)
    # subpixel shift via bilinear resampling
    dx, dy = 2.3, -1.7
    yy, xx = np.meshgrid(np.arange(240, dtype=np.float32),
                         np.arange(320, dtype=np.float32), indexing="ij")
    pos = np.stack([xx - dx, yy - dy], axis=-1)
    img1 = np.asarray(im.bilinear_sample(jnp.asarray(img0),
                                         jnp.asarray(pos)))
    pyr0 = im.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = im.build_pyramid(jnp.asarray(img1), 3)
    pts = rng.uniform([40, 40], [280, 200], size=(40, 2)).astype(np.float32)
    res = klt.track(pyr0, pyr1, jnp.asarray(pts), jnp.ones(40, bool))
    ok = np.asarray(res.ok)
    assert ok.sum() > 25
    d = np.asarray(res.pts)[ok] - pts[ok]
    np.testing.assert_allclose(d.mean(axis=0), [dx, dy], atol=0.15)


def test_klt_rejects_flat_regions():
    img0 = np.full((240, 320), 128.0, np.float32)
    img1 = img0.copy()
    pyr0 = im.build_pyramid(jnp.asarray(img0), 3)
    pyr1 = im.build_pyramid(jnp.asarray(img1), 3)
    pts = jnp.asarray([[100.0, 100.0], [200.0, 150.0]], jnp.float32)
    res = klt.track(pyr0, pyr1, pts, jnp.ones(2, bool))
    assert not bool(np.asarray(res.ok).any())


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------

def test_fundamental_ransac_separates_outliers(rng):
    # synthetic two-view geometry
    n = 120
    pts3 = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3)).astype(np.float32)
    R = np.asarray([[0.9950042, 0.0, 0.0998334],
                    [0.0, 1.0, 0.0],
                    [-0.0998334, 0.0, 0.9950042]], np.float32)  # 5.7° yaw
    t = np.asarray([0.3, 0.05, 0.02], np.float32)
    f = 460.0
    x1 = pts3[:, :2] / pts3[:, 2:3] * f
    p2 = pts3 @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:3] * f
    # inject outliers
    n_out = 25
    x2_noisy = x2.copy()
    out_idx = rng.choice(n, n_out, replace=False)
    x2_noisy[out_idx] += rng.uniform(15, 60, size=(n_out, 2)) * \
        rng.choice([-1, 1], size=(n_out, 2))
    res = ransac.fundamental_ransac(
        jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2_noisy),
        jnp.ones(n, bool), threshold=1.0)
    inl = np.asarray(res.inliers)
    is_out = np.zeros(n, bool)
    is_out[out_idx] = True
    # all kept points are true inliers; most true inliers kept
    assert not (inl & is_out).any()
    assert inl[~is_out].mean() > 0.85
