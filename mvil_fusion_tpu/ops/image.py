"""Image preprocessing kernels: CLAHE, pyramids, gradients, bilinear sampling.

Replaces the OpenCV calls of the reference front end
(reference: feature_tracker_/src/feature_tracker.cpp:89-92 cv::CLAHE(3.0,
8x8); pyramid construction inside cv::calcOpticalFlowPyrLK).  All kernels
are fixed-shape jnp ops that XLA fuses; images are (H, W) float32 in [0,256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def clahe(img: jnp.ndarray, clip_limit: float = 3.0,
          tiles: tuple[int, int] = (8, 8), n_bins: int = 256) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization.

    Vectorized: per-tile histograms → clipped CDF LUTs → bilinear LUT
    interpolation per pixel.  Matches cv::createCLAHE(clip, tiles)
    semantics (clip limit scaled by tile size / bins).
    """
    H, W = img.shape
    ty, tx = tiles
    th, tw = H // ty, W // tx
    imgc = jnp.clip(img, 0, n_bins - 1)
    t = imgc[: ty * th, : tx * tw].reshape(ty, th, tx, tw).transpose(0, 2, 1, 3)
    t = t.reshape(ty * tx, th * tw).astype(jnp.int32)

    # per-tile histogram via scatter-add
    hists = jax.vmap(lambda v: jnp.zeros(n_bins, jnp.float32).at[v].add(1.0))(t)

    # clip & redistribute (OpenCV style)
    clip = jnp.maximum(clip_limit * th * tw / n_bins, 1.0)
    clipped = jnp.minimum(hists, clip)
    excess = jnp.sum(hists - clipped, axis=1, keepdims=True)
    clipped = clipped + excess / n_bins

    cdf = jnp.cumsum(clipped, axis=1)
    cdf_min = cdf[:, :1]
    denom = jnp.maximum(th * tw - cdf_min, 1.0)
    luts = (cdf - cdf_min) / denom * (n_bins - 1)          # (T, bins)
    luts = luts.reshape(ty, tx, n_bins)

    # bilinear interpolation between the 4 surrounding tile LUTs
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    fy = jnp.clip((yy - th / 2) / th, 0.0, ty - 1.0)
    fx = jnp.clip((xx - tw / 2) / tw, 0.0, tx - 1.0)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ty - 1)
    x1 = jnp.minimum(x0 + 1, tx - 1)
    wy = fy - y0
    wx = fx - x0

    pix = imgc.astype(jnp.int32)
    y0b = jnp.broadcast_to(y0, (H, W))
    y1b = jnp.broadcast_to(y1, (H, W))
    x0b = jnp.broadcast_to(x0, (H, W))
    x1b = jnp.broadcast_to(x1, (H, W))
    v00 = luts[y0b, x0b, pix]
    v01 = luts[y0b, x1b, pix]
    v10 = luts[y1b, x0b, pix]
    v11 = luts[y1b, x1b, pix]
    wyb = jnp.broadcast_to(wy, (H, W))
    wxb = jnp.broadcast_to(wx, (H, W))
    out = ((1 - wyb) * ((1 - wxb) * v00 + wxb * v01)
           + wyb * ((1 - wxb) * v10 + wxb * v11))
    return out


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool downsample (pyramid level step)."""
    H, W = img.shape
    return img[: H // 2 * 2, : W // 2 * 2].reshape(
        H // 2, 2, W // 2, 2).mean(axis=(1, 3))


def build_pyramid(img: jnp.ndarray, levels: int):
    """[level0 (full res), level1, ...] — levels+1 images."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def scharr_gradients(img: jnp.ndarray):
    """(gx, gy) via 3x3 Scharr (same weighting family OpenCV LK uses)."""
    kx = jnp.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], jnp.float32) / 32.0
    ky = kx.T
    pad = jnp.pad(img, 1, mode="edge")

    def conv(k):
        out = jnp.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                out = out + k[dy, dx] * pad[dy:dy + img.shape[0],
                                            dx:dx + img.shape[1]]
        return out

    return conv(kx), conv(ky)


def sobel_gradients(img: jnp.ndarray):
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    ky = kx.T
    pad = jnp.pad(img, 1, mode="edge")

    def conv(k):
        out = jnp.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                out = out + k[dy, dx] * pad[dy:dy + img.shape[0],
                                            dx:dx + img.shape[1]]
        return out

    return conv(kx), conv(ky)


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample img at continuous (x, y) positions; xy (..., 2).
    Out-of-bounds clamps to the border."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = x - x0
    wy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))
