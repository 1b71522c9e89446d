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

    Matches cv::createCLAHE(clip, tiles) semantics (clip limit scaled by
    tile size / bins): per-tile histograms → clipped CDF LUTs → bilinear
    LUT blend per pixel.

    TPU-first formulation (round-5 rework): the natural per-pixel LUT
    lookup `luts[tile_y, tile_x, pix]` is a pointwise 3-D gather — the
    TPU scalar path, measured 16 ms/image on v5e.  Both the histogram
    and the LUT application are instead expressed against ONE-HOT bin
    indicators, which lower to MXU matmuls (1.4 ms/image):

      * histograms  = one-hot summed per tile (exact: 0/1 in bf16,
        f32 accumulation);
      * application = the bilinear tile blend is SEPARABLE, so first
        blend LUTs along the tile-row axis (`Lm[y, tx, bin]`), then
        contract the per-pixel one-hot against Lm (batched matmul over
        rows), then blend along tile-columns with tent weights.

    Precision HIGH on the f32 contraction: the TPU default (one bf16
    pass) would quantize LUT values by ~1 intensity unit.
    """
    H, W = img.shape
    ty, tx = tiles
    th, tw = H // ty, W // tx
    pix = jnp.clip(img, 0, n_bins - 1).astype(jnp.int32)
    onehot = (pix[..., None] == jnp.arange(n_bins))             # (H,W,bins)

    # per-tile histogram: sum one-hot over each tile block (no scatter)
    t = onehot[: ty * th, : tx * tw].astype(jnp.bfloat16)
    t = t.reshape(ty, th, tx, tw, n_bins)
    hists = jnp.einsum("ahbwc->abc", t,
                       preferred_element_type=jnp.float32)
    hists = hists.reshape(ty * tx, n_bins)

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

    # separable bilinear tile blend: tent weights along each tile axis
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    fy = jnp.clip((yy - th / 2) / th, 0.0, ty - 1.0)
    fx = jnp.clip((xx - tw / 2) / tw, 0.0, tx - 1.0)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[:, None] - jnp.arange(ty)))
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[:, None] - jnp.arange(tx)))

    Lm = jnp.einsum("yt,tjb->yjb", Wy, luts)               # (H, tx, bins)
    M = jnp.einsum("ywb,yjb->ywj", onehot.astype(jnp.float32), Lm,
                   precision=jax.lax.Precision.HIGH)       # (H, W, tx)
    return jnp.einsum("ywj,wj->yw", M, Wx)


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
