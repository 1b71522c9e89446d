"""Pyramidal Lucas-Kanade optical flow, batched over features.

Replaces cv::calcOpticalFlowPyrLK (21x21 window, 3 pyramid levels) of the
reference front end (reference: feature_tracker_/src/feature_tracker.cpp:113).

TPU-first: the per-feature iteration is a `lax.scan` with static trip count,
all features tracked in one `vmap` (one fused kernel per pyramid level).
Patch sampling is bilinear gather; the spatial-gradient matrix G is built
once per level per feature (inverse-compositional style on the template).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.ops import image as im


class KLTResult(NamedTuple):
    pts: jnp.ndarray      # (N,2) tracked positions in the new image
    ok: jnp.ndarray       # (N,) bool tracking success
    err: jnp.ndarray      # (N,) mean abs residual of the final window


def _patch_offsets(win: int, dtype=jnp.float32):
    r = (win - 1) / 2.0
    o = jnp.arange(win, dtype=dtype) - r
    oy, ox = jnp.meshgrid(o, o, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (win²,2)


def _track_level(img0, img1, pts0_lvl, guess, win, iters, min_eig_thr):
    """One pyramid level of LK for all features.

    pts0_lvl: (N,2) template positions at this level.
    guess: (N,2) current displacement estimate (this level's scale).
    Returns (new displacement, ok, err).
    """
    offs = _patch_offsets(win, img0.dtype)            # (P,2)
    gx, gy = im.scharr_gradients(img0)

    def per_feature(p0, d0):
        pos0 = p0[None, :] + offs                      # (P,2)
        t = im.bilinear_sample(img0, pos0)             # template patch
        ix = im.bilinear_sample(gx, pos0)
        iy = im.bilinear_sample(gy, pos0)
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0
        P = offs.shape[0]
        good_g = min_eig / P > min_eig_thr
        inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)

        def body(d, _):
            pos1 = p0[None, :] + d[None, :] + offs
            j = im.bilinear_sample(img1, pos1)
            di = j - t
            b0 = jnp.sum(di * ix)
            b1 = jnp.sum(di * iy)
            dx = inv_det * (gyy * b0 - gxy * b1)
            dy = inv_det * (gxx * b1 - gxy * b0)
            step = jnp.stack([dx, dy])
            return d - step, jnp.linalg.norm(step)

        d, steps = jax.lax.scan(body, d0, None, length=iters)
        pos1 = p0[None, :] + d[None, :] + offs
        err = jnp.mean(jnp.abs(im.bilinear_sample(img1, pos1) - t))
        ok = good_g & (steps[-1] < 1.0)
        return d, ok, err

    return jax.vmap(per_feature)(pts0_lvl, guess)


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
