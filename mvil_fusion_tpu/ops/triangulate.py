"""Batched multi-view triangulation.

Replaces FeatureManager::triangulate's per-feature SVD loop (reference:
vils_estimator/src/feature_manager.cpp:214-268) with one batched DLT solve
over all landmark slots: for each feature, stack the two projection rows of
every observing frame (masked), form the 4x4 normal matrix AᵀA, and take the
smallest eigenvector via `eigh` — identical math, one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


@full_precision
def triangulate_window(p_wc: jnp.ndarray, q_wc: jnp.ndarray,
                       obs: jnp.ndarray, mask: jnp.ndarray,
                       start: jnp.ndarray):
    """Triangulate all features against camera poses.

    Args:
      p_wc, q_wc: (W,3), (W,4) camera poses in world (T_w_c).
      obs: (F,W,2) normalized observations; mask: (F,W) validity.
      start: (F,) start-frame index (depth expressed in that camera).

    Returns (inv_depth (F,), good (F,)) — good requires ≥2 views and a
    positive, finite depth in the start frame.
    """
    F, W, _ = obs.shape
    dtype = obs.dtype

    # camera projection matrices world→cam: R = R_wcᵀ, t = -Rᵀ p
    R_wc = lie.quat_to_mat(q_wc)                      # (W,3,3)
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -jnp.einsum("wij,wj->wi", R_cw, p_wc)      # (W,3)
    P = jnp.concatenate([R_cw, t_cw[..., None]], axis=-1)  # (W,3,4)

    # DLT rows per (f,w): x*P[2] - P[0], y*P[2] - P[1]
    x = obs[..., 0:1]                                  # (F,W,1)
    y = obs[..., 1:2]
    P0 = P[None, :, 0, :]                              # (1,W,4)
    P1 = P[None, :, 1, :]
    P2 = P[None, :, 2, :]
    r0 = x * P2 - P0                                   # (F,W,4)
    r1 = y * P2 - P1
    m = mask[..., None].astype(dtype)
    A = jnp.concatenate([r0 * m, r1 * m], axis=1)      # (F,2W,4)
    AtA = jnp.einsum("fni,fnj->fij", A, A)             # (F,4,4)
    _, V = jnp.linalg.eigh(AtA)
    X = V[..., 0]                                      # smallest eigvec (F,4)
    w = X[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    pts = X[..., :3] / safe_w[..., None]               # (F,3) world points

    # depth in the start camera
    R_s = R_cw[start]                                  # (F,3,3)
    t_s = t_cw[start]
    pc = jnp.einsum("fij,fj->fi", R_s, pts) + t_s
    depth = pc[..., 2]
    n_obs = jnp.sum(mask, axis=1)
    good = (n_obs >= 2) & (depth > 0.1) & (depth < 200.0) & \
        jnp.isfinite(depth)
    inv_depth = jnp.where(good, 1.0 / jnp.maximum(depth, 0.1), 1.0)
    return inv_depth, good


def camera_poses_from_body(p_wb, q_wb, tic, qic):
    """T_w_c = T_w_b ∘ T_b_c for the whole window."""
    p_wc = p_wb + lie.quat_rotate(q_wb, jnp.broadcast_to(tic, p_wb.shape))
    q_wc = lie.quat_normalize(lie.quat_mul(q_wb, jnp.broadcast_to(
        qic, q_wb.shape)))
    return p_wc, q_wc
