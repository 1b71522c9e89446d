"""Shi-Tomasi corner detection with min-distance suppression.

Replaces cv::goodFeaturesToTrack + the reference's track-count-priority mask
(reference: feature_tracker_/src/feature_tracker.cpp:149 `goodFeaturesToTrack`
and :36-69 `setMask`).

TPU-first: the greedy circular mask of the reference is replaced by a
grid-cell suppression — existing features claim their min_dist-sized cell
(and score -inf), new corners are the per-cell argmax of the Shi-Tomasi
response followed by a global top-k.  Equivalent spacing guarantee, fully
data-parallel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.ops import image as im


def shi_tomasi_response(img: jnp.ndarray, block: int = 3) -> jnp.ndarray:
    """Min-eigenvalue corner response (cv::cornerMinEigenVal semantics)."""
    gx, gy = im.sobel_gradients(img)
    xx, xy, yy = gx * gx, gx * gy, gy * gy

    def box(a):
        pad = block // 2
        ap = jnp.pad(a, pad, mode="edge")
        out = jnp.zeros_like(a)
        for dy in range(block):
            for dx in range(block):
                out = out + ap[dy:dy + a.shape[0], dx:dx + a.shape[1]]
        return out / (block * block)

    sxx, sxy, syy = box(xx), box(xy), box(yy)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    return (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / 2.0


class Corners(NamedTuple):
    pts: jnp.ndarray     # (K,2) x,y
    score: jnp.ndarray   # (K,)
    ok: jnp.ndarray      # (K,) bool


def detect(img: jnp.ndarray, existing: jnp.ndarray, existing_valid: jnp.ndarray,
           max_new: int, min_dist: int = 30, quality: float = 0.01,
           border: int = 10) -> Corners:
    """Detect up to max_new corners at least min_dist from each other and
    from `existing` (N,2) valid features."""
    H, W = img.shape
    resp = shi_tomasi_response(img)

    # border mask
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = ((yy >= border) & (yy < H - border)
           & (xx >= border) & (xx < W - border))
    resp = jnp.where(inb, resp, -1.0)

    # per-cell argmax via RESHAPE into (gh, gw, min_dist*min_dist) blocks
    # and a plain max/argmax reduction.  (The earlier segment_max/
    # segment_min + flat[winner_idx] formulation lowers to scatter/gather
    # on 307200 elements — the TPU scalar path, 12.5 ms/image; the
    # reshape form is 1.4 ms and bit-identical: within a cell both pick
    # the row-major-first maximum.)
    gh = -(-H // min_dist)
    gw = -(-W // min_dist)
    rp = jnp.full((gh * min_dist, gw * min_dist), -1.0,
                  resp.dtype).at[:H, :W].set(resp)
    blocks = rp.reshape(gh, min_dist, gw, min_dist)
    blocks = blocks.transpose(0, 2, 1, 3).reshape(gh, gw,
                                                  min_dist * min_dist)
    loc = jnp.argmax(blocks, axis=2)                    # row-major-first
    ws = jnp.max(blocks, axis=2)
    ly = loc // min_dist
    lx = loc % min_dist
    wy = (jnp.arange(gh)[:, None] * min_dist + ly).astype(jnp.float32)
    wx = (jnp.arange(gw)[None, :] * min_dist + lx).astype(jnp.float32)
    wi = wy.astype(jnp.int32) * W + wx.astype(jnp.int32)

    # cells claimed by existing features (own cell + 8 neighbors ≈ the
    # reference's min_dist circular mask).  Invalid slots are pushed to a
    # far-negative position that clips into the pad ring (never read back).
    # Masking the per-cell WINNERS is equivalent to masking resp pixels:
    # a blocked cell's winner is discarded either way.
    ex = jnp.where(existing_valid[:, None], existing, -1e6)
    exc_x = jnp.clip(jnp.floor(ex[:, 0] / min_dist).astype(jnp.int32), -2, gw + 1)
    exc_y = jnp.clip(jnp.floor(ex[:, 1] / min_dist).astype(jnp.int32), -2, gh + 1)
    claimed = jnp.zeros((gh + 4, gw + 4), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            claimed = claimed.at[exc_y + 2 + dy, exc_x + 2 + dx].set(True)
    ws = jnp.where(claimed[2:2 + gh, 2:2 + gw], -1.0, ws)
    # absolute quality floor (the segment formulation required
    # cell_max >= quality for a winner to exist at all)
    ws = jnp.where(ws >= quality, ws, -1.0)

    # neighbor suppression between adjacent-cell winners: a winner dies if a
    # strictly stronger (ties → lower index) winner in one of the 8
    # neighboring cells lies within min_dist.  Cells two apart are always
    # ≥ min_dist away, so this enforces the full circular constraint of the
    # reference's mask.
    ws_p = jnp.pad(ws, 1, constant_values=-1e9)
    wx_p = jnp.pad(wx, 1, constant_values=1e9)
    wy_p = jnp.pad(wy, 1, constant_values=1e9)
    wi_p = jnp.pad(wi, 1, constant_values=2 ** 30)
    alive = ws > 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ns = ws_p[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            nx = wx_p[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            ny = wy_p[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            ni = wi_p[1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            close = (nx - wx) ** 2 + (ny - wy) ** 2 < min_dist ** 2
            stronger = (ns > ws) | ((ns == ws) & (ni < wi))
            alive = alive & ~(close & stronger)
    winner_score = jnp.where(alive, ws, -1.0).reshape(-1)

    # global top-k cells by score
    top_score, top_cell = jax.lax.top_k(winner_score, max_new)
    py = wy.reshape(-1)[top_cell]
    px = wx.reshape(-1)[top_cell]
    # threshold relative to best response (goodFeaturesToTrack qualityLevel)
    best = jnp.maximum(jnp.max(winner_score), 1e-9)
    ok = top_score > quality * best
    return Corners(pts=jnp.stack([px, py], axis=-1), score=top_score, ok=ok)
