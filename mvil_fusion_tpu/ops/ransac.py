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

from mvil_fusion_tpu.ops.voxel import _smallest_eigvec_sym3
from mvil_fusion_tpu.utils.precision import full_precision


class RansacResult(NamedTuple):
    inliers: jnp.ndarray   # (N,) bool
    F: jnp.ndarray         # (3,3) best model
    n_inliers: jnp.ndarray


def _nullvec9(A: jnp.ndarray) -> jnp.ndarray:
    """Unit null vector of an (8, 9) system via Householder QR of Aᵀ.

    8 unrolled reflections triangularize Aᵀ (9×8); the last column of the
    accumulated Q spans the orthogonal complement of A's row space, i.e.
    the (least-squares) null direction.  All slices are static, so the
    whole routine is straight batched vector math — no LAPACK loop."""
    R = A.T                                              # (9, 8)
    us = []
    for k in range(8):
        x = R[k:, k]
        sgn = jnp.where(x[0] >= 0, 1.0, -1.0).astype(A.dtype)
        alpha = -sgn * jnp.linalg.norm(x)
        u = x - alpha * jnp.zeros_like(x).at[0].set(1.0)
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
        R = R.at[k:, :].add(-2.0 * jnp.outer(u, u @ R[k:, :]))
        us.append(u)
    q = jnp.zeros((9,), A.dtype).at[8].set(1.0)
    for k in range(7, -1, -1):
        u = us[k]
        q = q.at[k:].add(-2.0 * u * (u @ q[k:]))
    return q


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

    # Null vector of A WITHOUT LAPACK: batched small-matrix SVD is an
    # iterative scalar-path routine on TPU (7.6 ms for the 256-hypothesis
    # batch — the whole rest of RANSAC is <1 ms).  The null vector of the
    # 8×9 system is computed by 8 unrolled Householder reflections (QR of
    # Aᵀ): after triangularizing, the orthogonal complement of the column
    # space is Q·e₉, recovered by applying the reflections to e₉ in
    # reverse.  Static shapes, pure batched vector arithmetic.
    f = _nullvec9(A).reshape(3, 3)

    # rank-2 enforcement: with v3 the smallest right singular vector
    # (= smallest eigenvector of fᵀf, closed form for symmetric 3×3),
    # dropping the smallest singular component is f(I − v3v3ᵀ).
    v3 = _smallest_eigvec_sym3(f.T @ f)
    f2 = f - jnp.outer(f @ v3, v3)
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
