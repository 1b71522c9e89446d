"""Pyramidal Lucas-Kanade optical flow, batched over features.

Replaces cv::calcOpticalFlowPyrLK (21x21 window, 3 pyramid levels) of the
reference front end (reference: feature_tracker_/src/feature_tracker.cpp:113).

TPU-first, round-4 rework: the original implementation sampled every window
pixel with a pointwise 2D gather (`img[y0, x0]`), which XLA:TPU executes on
the scalar path — ~200 ms per image, the single largest device cost of the
whole system.  The rework keeps the identical inverse-compositional LK math
but restructures all memory access into forms the TPU executes at full
vector/MXU rate:

  1. per-feature patch EXTRACTION: one row-take (contiguous rows) plus one
     in-row take_along_axis — measured 0.09 ms for 256x(44x44) patches
     (vs 4 ms via one-hot matmul, 35 ms via pointwise gather);
  2. bilinear sampling at a regular grid = two small "tent-matrix"
     matmuls per feature: bilinear interpolation is separable, so
     sampling window rows/cols at fractional offsets is exactly
     `T_y @ patch @ T_x^T` with tent weights max(0, 1-|col-center|);
  3. gradients via a dense Scharr stencil on the extracted patches.

The iterate lives in patch coordinates; a `margin` ring around the window
absorbs per-level displacement (the pyramid absorbs large motion).  Samples
clamp at patch edges (border-replicate), matching the old border-clamp
behavior; diverged tracks are culled by the step/err/in-bounds checks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.ops import image as im


class KLTResult(NamedTuple):
    pts: jnp.ndarray      # (N,2) tracked positions in the new image
    ok: jnp.ndarray       # (N,) bool tracking success
    err: jnp.ndarray      # (N,) mean abs residual of the final window


def _tent(centers: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable bilinear sampling matrix.

    centers: (..., Q) continuous source positions; returns (..., Q, size)
    weights max(0, 1-|col-center|) — each row holds the two bilinear taps.
    Positions are clamped to [0, size-1] (border replicate)."""
    c = jnp.clip(centers, 0.0, size - 1.0)
    cols = jnp.arange(size, dtype=centers.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(cols - c[..., None]))


def _extract(img: jnp.ndarray, bx: jnp.ndarray, by: jnp.ndarray,
             S: int) -> jnp.ndarray:
    """(N,S,S) integer-aligned patches at (bx, by) corners.

    Row-take + one-hot column MATMUL.  The row take is a contiguous
    (whole-row) gather the TPU executes at memory speed; the in-row
    column select is NOT — a minor-dim `take_along_axis` lowers to the
    scalar gather path (measured 88 ms vs 2.8 ms for the 15 extracts of
    one tracker image on v5e).  Selecting columns by multiplying with a
    one-hot matrix runs on the MXU instead.  Precision must be HIGHEST:
    the default TPU matmul precision is bf16, which would quantize image
    intensities to 8 mantissa bits and break subpixel tracking; with one
    nonzero per one-hot row at HIGHEST the select is exact."""
    N = bx.shape[0]
    W = img.shape[1]
    rows = jnp.take(img, by[:, None] + jnp.arange(S), axis=0,
                    mode="clip")                                # (N,S,W)
    cols = jnp.clip(bx[:, None] + jnp.arange(S), 0, W - 1)      # (N,S)
    onehot = (cols[:, None, :]
              == jnp.arange(W)[None, :, None]).astype(img.dtype)  # (N,W,S)
    return jnp.einsum('nsw,nwu->nsu', rows, onehot,
                      precision=jax.lax.Precision.HIGHEST)


def _scharr_patch(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense 3x3 Scharr gradients on (N,S,S) patches (edge-replicated)."""
    S = p.shape[-1]
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1)), mode="edge")
    w = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)
    gx = sum(w[dy] * (pp[:, dy:dy + S, 2:2 + S] - pp[:, dy:dy + S, 0:S])
             for dy in range(3))
    gy = sum(w[dx] * (pp[:, 2:2 + S, dx:dx + S] - pp[:, 0:S, dx:dx + S])
             for dx in range(3))
    return gx, gy


def _track_level(img0, img1, pts0_lvl, guess, win, iters, min_eig_thr,
                 margin: int = 10):
    """One pyramid level of LK for all features.

    pts0_lvl: (N,2) template positions at this level.
    guess: (N,2) current displacement estimate (this level's scale).
    Returns (new displacement, ok, err).

    The target patch is RE-EXTRACTED (re-centered on the current iterate)
    between iteration halves, so the capture range per level is ~2*margin
    instead of margin — the old global-gather sampler had unlimited range,
    and fast motion at the coarsest level otherwise clamps at the patch
    edge and converges to a wrong fixed point.
    """
    H, W = img0.shape
    dtype = img0.dtype
    r = (win - 1) / 2.0
    S = win + 2 * margin + 2
    win_off = jnp.arange(win, dtype=dtype)

    def base_of(p):
        b = jnp.floor(p - r - margin)
        return jnp.clip(b, 0.0, jnp.asarray([max(W - S, 0), max(H - S, 0)],
                                            dtype))

    b0 = base_of(pts0_lvl)
    p0 = _extract(img0, b0[:, 0].astype(jnp.int32),
                  b0[:, 1].astype(jnp.int32), S)
    gx, gy = _scharr_patch(p0)

    def window_mats(p_center, base):
        """Tent matrices sampling the win x win grid centered at p_center
        (image coords) out of the patch extracted at `base`."""
        cy = (p_center[:, 1] - r)[:, None] + win_off[None, :] - base[:, 1:2]
        cx = (p_center[:, 0] - r)[:, None] + win_off[None, :] - base[:, 0:1]
        return _tent(cy, S), _tent(cx, S)

    # template + gradient windows (sampled once, 3 channels in one einsum).
    # HIGHEST precision: default TPU matmul is bf16, whose 8-bit mantissa
    # quantizes intensities by ~1 unit — the LK residual scale.
    Ty0, Tx0 = window_mats(pts0_lvl, b0)
    chan = jnp.stack([p0, gx, gy], axis=1)                      # (N,3,S,S)
    tpl = jnp.einsum("nys,ncst,nxt->ncyx", Ty0, chan, Tx0,
                     precision=jax.lax.Precision.HIGHEST)
    t, ix, iy = tpl[:, 0], tpl[:, 1], tpl[:, 2]

    gxx = jnp.sum(ix * ix, (1, 2))
    gxy = jnp.sum(ix * iy, (1, 2))
    gyy = jnp.sum(iy * iy, (1, 2))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0
    P = float(win * win)
    good_g = min_eig / P > min_eig_thr
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)

    def sample1(p1, b1, d):
        Ty, Tx = window_mats(pts0_lvl + d, b1)
        return jnp.einsum("nys,nst,nxt->nyx", Ty, p1, Tx,
                          precision=jax.lax.Precision.HIGHEST)

    def run_half(d, n_it):
        """(Re-)extract the target patch centered on the current iterate,
        then n_it LK iterations against it."""
        b1 = base_of(pts0_lvl + d)
        p1 = _extract(img1, b1[:, 0].astype(jnp.int32),
                      b1[:, 1].astype(jnp.int32), S)

        def body(dd, _):
            j = sample1(p1, b1, dd)
            di = j - t
            b0_ = jnp.sum(di * ix, (1, 2))
            b1_ = jnp.sum(di * iy, (1, 2))
            dx = inv_det * (gyy * b0_ - gxy * b1_)
            dy = inv_det * (gxx * b1_ - gxy * b0_)
            step = jnp.stack([dx, dy], axis=-1)
            return dd - step, jnp.linalg.norm(step, axis=-1)

        d, steps = jax.lax.scan(body, d, None, length=n_it)
        return d, steps, p1, b1

    half = max(iters // 2, 1)
    d, _, _, _ = run_half(guess, half)
    d, steps, p1, b1 = run_half(d, max(iters - half, 1))
    err = jnp.mean(jnp.abs(sample1(p1, b1, d) - t), (1, 2))
    ok = good_g & (steps[-1] < 1.0)
    return d, ok, err


def track(pyr0, pyr1, pts0: jnp.ndarray, valid: jnp.ndarray,
          win: int = 21, iters: int = 10, min_eig_thr: float = 1e-4,
          max_err: float = 30.0) -> KLTResult:
    """Track pts0 from pyramid pyr0 to pyr1 (lists from build_pyramid).

    pts0: (N,2) full-resolution positions; valid: (N,) slot mask.
    """
    levels = len(pyr0) - 1
    n = pts0.shape[0]
    d = jnp.zeros((n, 2), pyr0[0].dtype)
    ok_all = jnp.ones((n,), bool)
    err = jnp.zeros((n,), pyr0[0].dtype)
    for lvl in range(levels, -1, -1):
        scale = 2.0 ** lvl
        p_lvl = pts0 / scale
        d, ok, err = _track_level(pyr0[lvl], pyr1[lvl], p_lvl, d,
                                  win, iters, min_eig_thr)
        ok_all = ok_all & ok
        if lvl > 0:
            d = d * 2.0
    pts1 = pts0 + d
    H, W = pyr0[0].shape
    inb = ((pts1[:, 0] >= 1.0) & (pts1[:, 0] < W - 1.0)
           & (pts1[:, 1] >= 1.0) & (pts1[:, 1] < H - 1.0))
    ok_final = valid & ok_all & inb & (err < max_err)
    return KLTResult(pts=pts1, ok=ok_final, err=err)
