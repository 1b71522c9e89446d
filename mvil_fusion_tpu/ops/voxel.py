"""Voxel hashing primitives: downsampling and Gaussian voxel statistics.

The TPU replacement for PCL voxel grids and the KNN machinery of the
reference (reference: pcl::VoxelGrid at vils_estimator/src/estimator.cpp:
240-247, fast_gicp's GaussianVoxelMap in
lidar_functions/fast_gicp/include/fast_gicp/gicp/fast_vgicp_voxel.hpp).
Trees and KNN are replaced by a single-probe spatial hash with stored voxel
coordinates for collision rejection — pure scatter/gather, no pointers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# large primes for the 3-D spatial hash (classic Teschner et al.)
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def sym3_eigvals(A: jnp.ndarray):
    """Cardano closed-form eigenvalues of batched symmetric 3x3 matrices:
    (λ₀ ≤ λ₁ ≤ λ₂).  Orders of magnitude faster than batched LAPACK on
    large tables; used for voxel plane regularization and LOAM geometry
    gates."""
    dtype = A.dtype
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = (B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2]
                            - B[..., 1, 2] * B[..., 2, 1])
            - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2]
                              - B[..., 1, 2] * B[..., 2, 0])
            + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1]
                              - B[..., 1, 1] * B[..., 2, 0]))
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)                         # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)    # smallest
    lam1 = 3.0 * q - lam0 - lam2
    return lam0, lam1, lam2


def sym3_eigvec(A: jnp.ndarray, lamA: jnp.ndarray, lamB: jnp.ndarray,
                fallback) -> jnp.ndarray:
    """Unit eigenvector for the remaining eigenvalue of symmetric 3x3 A via
    Cayley-Hamilton: any column of (A−λ_A I)(A−λ_B I) lies along it."""
    dtype = A.dtype
    I = jnp.eye(3, dtype=dtype)
    M = jnp.einsum("...ij,...jk->...ik",
                   A - lamA[..., None, None] * I,
                   A - lamB[..., None, None] * I)
    norms = jnp.linalg.norm(M, axis=-2)                       # column norms
    best = jnp.argmax(norms, axis=-1)
    col = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
    cn = jnp.linalg.norm(col, axis=-1, keepdims=True)
    fb = jnp.asarray(fallback, dtype)
    return jnp.where(cn > 1e-12, col / jnp.maximum(cn, 1e-30), fb)


def _smallest_eigvec_sym3(A: jnp.ndarray) -> jnp.ndarray:
    lam0, lam1, lam2 = sym3_eigvals(A)
    return sym3_eigvec(A, lam1, lam2, [0.0, 0.0, 1.0])


def voxel_coords(pts: jnp.ndarray, leaf: float) -> jnp.ndarray:
    return jnp.floor(pts / leaf).astype(jnp.int32)


def hash_coords(c: jnp.ndarray, table_size: int) -> jnp.ndarray:
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    return jnp.abs(h) % table_size


class VoxelDownsample(NamedTuple):
    pts: jnp.ndarray    # (M,3) centroids (padded)
    mask: jnp.ndarray   # (M,)


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     max_out: int, table_size: int = 1 << 18
                     ) -> VoxelDownsample:
    """Centroid voxel downsample with static output capacity.

    pts may be (N,3) xyz or (N,3+C) xyz + extra channels (e.g. intensity);
    voxelization keys on xyz, all channels are voxel-averaged."""
    dtype = pts.dtype
    D = pts.shape[-1]
    c = voxel_coords(pts[..., :3], leaf)
    h = hash_coords(c, table_size)
    w = mask.astype(dtype)
    sums = jnp.zeros((table_size, D), dtype).at[h].add(pts * w[:, None])
    cnts = jnp.zeros((table_size,), dtype).at[h].add(w)
    occ = cnts > 0
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    # compact the occupied buckets into the first max_out slots
    rank = jnp.cumsum(occ) - 1                    # occupied bucket -> slot
    slot = jnp.where(occ, rank, max_out)          # drop overflow + empties
    out = jnp.zeros((max_out, D), dtype).at[slot].set(centroids, mode="drop")
    out_mask = jnp.zeros((max_out,), bool).at[slot].set(occ, mode="drop")
    return VoxelDownsample(pts=out, mask=out_mask)


class GaussianVoxelMap(NamedTuple):
    """Per-voxel Gaussian statistics in a single-probe hash table."""

    mean: jnp.ndarray     # (H,3)
    cov: jnp.ndarray      # (H,3,3)
    count: jnp.ndarray    # (H,)
    coords: jnp.ndarray   # (H,3) int32 owner voxel coords (for collision
                          # rejection; last-writer-wins on collisions)
    leaf: float
    table_size: int


def build_gaussian_voxel_map(pts: jnp.ndarray, mask: jnp.ndarray,
                             leaf: float, table_size: int = 1 << 18,
                             min_points: int = 2,
                             plane_eps: float = 1e-3) -> GaussianVoxelMap:
    """Voxel means + covariances via scatter-add (one pass, no KNN).

    Covariances get fast_gicp's PLANE regularization: eigenvalues replaced
    by (1, 1, eps) (reference: fast_gicp RegularizationMethod::PLANE,
    lidar_functions/fast_gicp — covariance_estimation), so the Mahalanobis
    weight carries direction only and magnitudes are normalized.
    """
    dtype = pts.dtype
    c = voxel_coords(pts, leaf)
    h = hash_coords(c, table_size)
    # purity pass: claim buckets (last writer wins), then accumulate only
    # points whose voxel owns their bucket — hash collisions drop the losing
    # voxel instead of corrupting the winner's statistics.
    imin = jnp.iinfo(jnp.int32).min
    h_masked = jnp.where(mask, h, table_size)      # invalid → dropped write
    coords = jnp.full((table_size, 3), imin, jnp.int32).at[h_masked].set(
        c, mode="drop")
    mine = jnp.all(coords[h] == c, axis=-1) & mask
    w = mine.astype(dtype)
    s1 = jnp.zeros((table_size, 3), dtype).at[h].add(pts * w[:, None])
    s2 = jnp.zeros((table_size, 3, 3), dtype).at[h].add(
        (pts[:, :, None] * pts[:, None, :]) * w[:, None, None])
    n = jnp.zeros((table_size,), dtype).at[h].add(w)
    n_safe = jnp.maximum(n, 1.0)
    mean = s1 / n_safe[:, None]
    cov = s2 / n_safe[:, None, None] - mean[:, :, None] * mean[:, None, :]
    # PLANE regularization: eigenvalues → (1, 1, eps).  Written as
    # I − (1−eps)·v₀v₀ᵀ with v₀ the smallest eigenvector, computed in
    # closed form (Cardano eigenvalues + Cayley-Hamilton projector) — a
    # LAPACK-style batched eigh over the whole 2^18-bucket table costs
    # ~170 ms on a v5e; this is a handful of fused VPU ops.
    cov = cov + 1e-9 * jnp.eye(3, dtype=dtype)
    v0 = _smallest_eigvec_sym3(cov)
    cov = (jnp.eye(3, dtype=dtype)[None]
           - (1.0 - plane_eps) * v0[:, :, None] * v0[:, None, :])
    valid = n >= min_points
    count = jnp.where(valid, n, 0.0)
    return GaussianVoxelMap(mean=mean, cov=cov, count=count, coords=coords,
                            leaf=leaf, table_size=table_size)


def lookup(vm: GaussianVoxelMap, pts: jnp.ndarray):
    """Query the voxel containing each point.

    Returns (mean (N,3), cov (N,3,3), hit (N,)). A hit requires the stored
    owner coords to match (hash-collision rejection)."""
    c = voxel_coords(pts, vm.leaf)
    h = hash_coords(c, vm.table_size)
    mean = vm.mean[h]
    cov = vm.cov[h]
    cnt = vm.count[h]
    owner = vm.coords[h]
    hit = (cnt > 0) & jnp.all(owner == c, axis=-1)
    return mean, cov, hit


_NEIGHBOR7 = jnp.asarray([[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
                          [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.int32)


def lookup7(vm: GaussianVoxelMap, pts: jnp.ndarray):
    """Query the containing voxel and its 6 face neighbors, returning the
    nearest-mean valid hit (fast_gicp's DIRECT7 neighborhood mode —
    fast_vgicp_impl.hpp).  Widens the convergence basin vs center-only."""
    c = voxel_coords(pts, vm.leaf)                       # (N,3)
    cn = c[:, None, :] + _NEIGHBOR7[None, :, :]          # (N,7,3)
    h = hash_coords(cn, vm.table_size)                   # (N,7)
    mean = vm.mean[h]                                    # (N,7,3)
    cov = vm.cov[h]
    cnt = vm.count[h]
    owner = vm.coords[h]
    hit = (cnt > 0) & jnp.all(owner == cn, axis=-1)      # (N,7)
    d2 = jnp.sum((mean - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(hit, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)                       # (N,)
    n_idx = jnp.arange(pts.shape[0])
    return (mean[n_idx, best], cov[n_idx, best],
            jnp.isfinite(d2[n_idx, best]))
