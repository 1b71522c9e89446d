"""Batched fundamental-matrix RANSAC for tracker outlier rejection.

Replaces cv::findFundamentalMat(FM_RANSAC) in the reference's rejectWithF
(reference: feature_tracker_/src/feature_tracker.cpp:169-202 — points are
lifted to a virtual 460-focal image first, threshold 1 px).

TPU-first: all hypotheses are evaluated in one batch — B random 8-point
samples → normalized 8-point solve via batched SVD → Sampson distance →
inlier counts → argmax.  No sequential hypothesis loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.utils.precision import full_precision


class RansacResult(NamedTuple):
    inliers: jnp.ndarray   # (N,) bool
    F: jnp.ndarray         # (3,3) best model
    n_inliers: jnp.ndarray


def _eight_point(x1, x2):
    """Normalized 8-point: x1, x2 (8,2) → F (3,3).  Batched via vmap."""
    def normalize(x):
        mean = jnp.mean(x, axis=0)
        d = jnp.mean(jnp.linalg.norm(x - mean, axis=-1))
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
        T = jnp.array([[s, 0, -s * mean[0]],
                       [0, s, -s * mean[1]],
                       [0, 0, 1.0]], x.dtype)
        xh = jnp.concatenate([x, jnp.ones_like(x[:, :1])], axis=-1)
        return (xh @ T.T)[:, :2], T

    n1, T1 = normalize(x1)
    n2, T2 = normalize(x2)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one],
                  axis=-1)                                   # (8,9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    f = Vt[-1].reshape(3, 3)
    # rank-2 enforcement
    U, S, Vt2 = jnp.linalg.svd(f)
    S = S.at[2].set(0.0)
    f2 = (U * S[None, :]) @ Vt2
    return T2.T @ f2 @ T1


def _sampson(F, x1, x2):
    """Sampson distance of correspondences under F; x (N,2)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Fx1 = x1h @ F.T          # (N,3)
    Ftx2 = x2h @ F           # (N,3)
    num = jnp.sum(x2h * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@full_precision
def fundamental_ransac(key, x1: jnp.ndarray, x2: jnp.ndarray,
                       valid: jnp.ndarray, threshold: float = 1.0,
                       n_hyp: int = 256) -> RansacResult:
    """x1, x2: (N,2) correspondences in (virtual-focal) pixel coords;
    valid: (N,) slot mask.  threshold in the same pixel units."""
    n = x1.shape[0]
    dtype = x1.dtype

    # sample 8 valid indices per hypothesis: random keys per hypothesis,
    # weighted choice over valid slots (with replacement — degenerate
    # samples simply score poorly)
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, n, shape=(n_hyp, 8), replace=True, p=p)

    Fs = jax.vmap(lambda i: _eight_point(x1[i], x2[i]))(idx)   # (B,3,3)
    d = jax.vmap(lambda F: _sampson(F, x1, x2))(Fs)            # (B,N)
    thr2 = threshold * threshold
    inl = (d < thr2) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    return RansacResult(inliers=inl[best], F=Fs[best],
                        n_inliers=counts[best])
