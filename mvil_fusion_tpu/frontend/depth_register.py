"""LiDAR-aided feature depth registration.

Replaces the reference's DepthRegister (reference: feature_tracker_/src/
feature_tracker.h:67-343 — 5 s deque of deskewed world-frame clouds,
360x360 range-image dedup, unit-sphere kd-tree 3-NN, depth = mean neighbor
range when the spread is < 2 m and depth > 3 m) and its node hookup
(feature_tracker_node.cpp:252-337, every 2nd sweep ≈ 5 Hz).

TPU-first: the kd-tree is a single features×cloud max-inner-product matmul
on the unit sphere; the range-image dedup is a scatter-min onto a fixed
polar grid.  One jitted call per image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.utils import lie

CLOUD_CAP = 32768


@partial(jax.jit, static_argnames=("min_depth", "max_spread"))
def _register_depth(feat_norm, feat_valid, cloud_cam, cloud_mask,
                    min_depth: float = 3.0, max_spread: float = 2.0):
    """feat_norm (F,2) normalized camera coords; cloud_cam (N,3) points in
    the camera frame.  Returns (depth (F,), ok (F,))."""
    dtype = feat_norm.dtype
    # unit-sphere directions
    f3 = jnp.concatenate([feat_norm, jnp.ones_like(feat_norm[:, :1])], -1)
    f_dir = f3 / jnp.linalg.norm(f3, axis=-1, keepdims=True)
    rng_ = jnp.linalg.norm(cloud_cam, axis=-1)
    in_front = cloud_mask & (cloud_cam[:, 2] > 0.2) & (rng_ > 0.3)
    c_dir = cloud_cam / jnp.maximum(rng_[:, None], 1e-6)

    # range-image dedup (360x360 polar grid, keep nearest per cell —
    # feature_tracker.h:143-180)
    az = jnp.arctan2(c_dir[:, 0], c_dir[:, 2])
    el = jnp.arcsin(jnp.clip(c_dir[:, 1], -1.0, 1.0))
    gi = jnp.clip(((az / jnp.pi + 1.0) * 180).astype(jnp.int32), 0, 359)
    gj = jnp.clip(((el / jnp.pi + 0.5) * 360).astype(jnp.int32), 0, 359)
    cell = jnp.where(in_front, gi * 360 + gj, 360 * 360)
    best = jnp.full((360 * 360,), jnp.inf, dtype).at[cell].min(
        rng_, mode="drop")
    keep = in_front & (rng_ <= best[jnp.minimum(cell, 360 * 360 - 1)] + 1e-3)

    # 3-NN by max inner product on the sphere
    sim = f_dir @ c_dir.T                                   # (F,N)
    sim = jnp.where(keep[None, :], sim, -2.0)
    top_sim, top_idx = jax.lax.top_k(sim, 3)
    r3 = rng_[top_idx]                                      # (F,3)
    # angular gate: all 3 neighbors within ~1.5 deg
    ang_ok = jnp.all(top_sim > jnp.cos(jnp.deg2rad(1.5)), axis=-1)
    spread = jnp.max(r3, axis=-1) - jnp.min(r3, axis=-1)
    depth = jnp.mean(r3, axis=-1)
    ok = (feat_valid & ang_ok & (spread < max_spread)
          & (depth > min_depth))
    return jnp.where(ok, depth, -1.0), ok


class DepthRegister:
    def __init__(self, cfg: SystemConfig, window_sec: float = 5.0):
        self.cfg = cfg
        self.window_sec = window_sec
        self.clouds: list[tuple] = []   # (t, pts_world (M,3) np)

    def add_cloud(self, t: float, pts_world: np.ndarray):
        """Deskewed cloud in the world frame (the estimator's lidar_cloud
        topic, downsampled)."""
        self.clouds.append((t, pts_world.astype(np.float32)))
        while self.clouds and self.clouds[0][0] < t - self.window_sec:
            self.clouds.pop(0)

    def get_depth(self, t_img: float, feat_norm: np.ndarray,
                  feat_valid: np.ndarray, p_wc: np.ndarray,
                  q_wc: np.ndarray) -> np.ndarray:
        """Depths for the current features given the camera pose T_w_c."""
        if not self.clouds:
            return np.full(len(feat_norm), -1.0, np.float32)
        pts = np.concatenate([c for (_, c) in self.clouds], axis=0)
        if len(pts) > CLOUD_CAP:
            pts = pts[-CLOUD_CAP:]
        buf = np.zeros((CLOUD_CAP, 3), np.float32)
        buf[: len(pts)] = pts
        mask = np.zeros(CLOUD_CAP, bool)
        mask[: len(pts)] = True
        w, x, y, z = np.asarray(q_wc, np.float64)
        R = np.asarray([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float32)  # host-side: avoids a device fetch per lookup
        cam = (buf - np.asarray(p_wc, np.float32)[None, :]) @ R
        depth, ok = _register_depth(
            jnp.asarray(feat_norm, jnp.float32), jnp.asarray(feat_valid),
            jnp.asarray(cam), jnp.asarray(mask))
        return np.asarray(depth)
