"""LOAM scan-to-map registration: edge (point-to-line) and plane
(point-to-plane) correspondences + Gauss-Newton on SE(3).

Replaces the reference's localMapping correspondence + Ceres solve
(reference: lidar_mapping/src/localMapping.cpp:586-793 — kd-tree 5-NN edge
line fit via eigen-decomposition, 10-NN plane QR fit, 2 outer x ≤4 inner
iterations with Huber; factors lidar_mapping/src/lidarFactor.hpp:12-171).

TPU-first: kd-trees are replaced by brute-force top-k over an MXU distance
matrix (query ~10³ × map ~10⁴ is a single small matmul); line/plane fits are
batched eigendecompositions / least squares; the whole outer×inner loop is
one `lax.scan` program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.ops.voxel import sym3_eigvals, sym3_eigvec
from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


import os

# Fused Pallas k-NN (ops/pallas_knn.py): streams the reference through
# VMEM and never materializes the (Nq,Nr) distance matrix — at reference
# scale the XLA path below writes+reads a 512 MB intermediate through
# HBM.  Default ON for TPU since the round-5 on-chip profile: it is both
# faster (3.3 vs 3.9 ms at 2048x32768 k=5; 4.7 vs 6.3 ms at 4096) and
# EXACT (1.000 agreement vs float64 truth) where the XLA path's default
# single-bf16-pass matmul scrambles ~40% of the ranking at map scale
# (PERF.md §5).  MVIL_PALLAS_KNN=0 forces the XLA path, =1 forces Pallas
# everywhere (tests use interpreter mode on CPU).
_PALLAS_KNN_ENV = os.environ.get("MVIL_PALLAS_KNN", "")


def _use_pallas_knn() -> bool:
    if _PALLAS_KNN_ENV == "0":
        return False
    if _PALLAS_KNN_ENV == "1":
        return True
    return jax.default_backend() == "tpu"


def _solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3×3 solve via the adjugate — closed-form vector math
    (jnp.linalg.solve lowers to a batched LAPACK-style LU on the TPU
    scalar path)."""
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = (A[..., 0, 0] * c00 + A[..., 0, 1] * c10 + A[..., 0, 2] * c20)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, jnp.inf, det)
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def knn(query: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray,
        k: int):
    """Brute-force k-NN: (Nq,3) vs (Nr,3) → (idx (Nq,k), d2 (Nq,k))."""
    if _use_pallas_knn():
        from mvil_fusion_tpu.ops.pallas_knn import knn_topk
        return knn_topk(query, ref, ref_mask, k)
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)       # (Nq,1)
    r2 = jnp.sum(ref * ref, axis=-1)                          # (Nr,)
    # HIGHEST: a single-bf16-pass d2 matmul carries ~4–8 abs error at
    # map scale, scrambling the neighbor ranking (measured on chip)
    d2 = q2 + r2[None, :] - 2.0 * jnp.matmul(
        query, ref.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.where(ref_mask[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, -neg


class Correspondences(NamedTuple):
    """Precomputed geometric targets for one GN stage."""

    edge_pt: jnp.ndarray      # (Ne,3) source corner points (sensor frame)
    edge_a: jnp.ndarray       # (Ne,3) line point A (world)
    edge_b: jnp.ndarray       # (Ne,3) line point B (world)
    edge_ok: jnp.ndarray      # (Ne,)
    plane_pt: jnp.ndarray     # (Np,3)
    plane_n: jnp.ndarray      # (Np,3) unit normal (world)
    plane_d: jnp.ndarray      # (Np,) plane offset: n·x + d = 0
    plane_ok: jnp.ndarray     # (Np,)


def find_correspondences(corner_src, corner_mask, surf_src, surf_mask,
                         corner_map, corner_map_mask, surf_map,
                         surf_map_mask, p, q,
                         max_corr_dist: float = 1.0,
                         k_edge: int = 5, k_surf: int = 5,
                         surf_i=None, surf_map_i=None,
                         k_surf_knn: int = 10
                         ) -> Correspondences:
    """Associate transformed source features with map lines/planes.

    Mirrors localMapping.cpp:594-793: edges need the 5-NN cluster to be
    line-like (λ2 > 3λ1); planes need a consistent LSQ plane fit.  When
    surf intensities are given, the plane fit uses the `k_surf` most
    reflectivity-similar of the `k_surf_knn` nearest map points (the
    reference's intensity-similar surf selection, localMapping.cpp:697-709).
    """
    dtype = corner_src.dtype
    cw = lie.quat_rotate(q[None, :], corner_src) + p[None, :]
    sw = lie.quat_rotate(q[None, :], surf_src) + p[None, :]

    # ---- edges
    eidx, ed2 = knn(cw, corner_map, corner_map_mask, k_edge)
    near_ok = ed2[:, -1] < max_corr_dist * max_corr_dist
    nbr = corner_map[eidx]                                   # (Ne,k,3)
    ctr = jnp.mean(nbr, axis=1, keepdims=True)
    dc = nbr - ctr
    cov = jnp.einsum("nki,nkj->nij", dc, dc) / k_edge
    lam0, lam1, lam2 = sym3_eigvals(cov)                 # closed form
    dir_ = sym3_eigvec(cov, lam0, lam1, [1.0, 0.0, 0.0])  # main axis
    line_like = lam2 > 3.0 * lam1
    a = ctr[:, 0, :] + 0.1 * dir_
    b = ctr[:, 0, :] - 0.1 * dir_
    edge_ok = corner_mask & near_ok & line_like & jnp.isfinite(ed2[:, -1])

    # ---- planes
    if surf_i is not None and surf_map_i is not None:
        sidx10, sd2_10 = knn(sw, surf_map, surf_map_mask, k_surf_knn)
        # distance gate on the k_surf-th nearest (reference gates
        # pointSearchSqDis[4] of the 10-NN), then keep the k_surf most
        # intensity-similar neighbors for the fit
        snear = sd2_10[:, k_surf - 1] < max_corr_dist * max_corr_dist
        di = jnp.abs(surf_map_i[sidx10] - surf_i[:, None])     # (Np,10)
        di = jnp.where(jnp.isfinite(sd2_10), di, jnp.inf)
        _, sel = jax.lax.top_k(-di, k_surf)                    # (Np,k)
        sidx = jnp.take_along_axis(sidx10, sel, axis=1)
        sd2 = jnp.take_along_axis(sd2_10, sel, axis=1)
    else:
        sidx, sd2 = knn(sw, surf_map, surf_map_mask, k_surf)
        snear = sd2[:, -1] < max_corr_dist * max_corr_dist
    snbr = surf_map[sidx]                                    # (Np,k,3)
    # LSQ plane: N·x = -1 (A-LOAM formulation), trace-relative ridge for
    # f32 robustness on near-collinear clusters.  Solved by closed-form
    # adjugate (batched 3×3 LAPACK solve is a scalar-path routine on TPU;
    # the adjugate is pure vector arithmetic, max diff 7e-7).
    ones = -jnp.ones((snbr.shape[0], k_surf, 1), dtype)
    AtA = jnp.einsum("nki,nkj->nij", snbr, snbr)
    Atb = jnp.einsum("nki,nkl->nil", snbr, ones)[..., 0]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[:, None, None]
    ridge = (1e-5 * tr + 1e-6) * jnp.eye(3, dtype=dtype)
    n_raw = _solve3x3(AtA + ridge, Atb)
    finite_n = jnp.isfinite(n_raw).all(axis=-1)
    n_raw = jnp.where(finite_n[:, None], n_raw, 1.0)
    norm = jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
    n_unit = n_raw / jnp.maximum(norm, 1e-9)
    d_plane = 1.0 / jnp.maximum(norm[..., 0], 1e-9)
    d_plane = jnp.where(jnp.isfinite(d_plane), d_plane, 0.0)
    # fit validity: all neighbors within 0.2 of the plane AND the cluster is
    # genuinely planar, not a single scan-line (λ1 must carry real spread —
    # a collinear stripe fits infinitely many planes)
    dist_nb = jnp.abs(jnp.einsum("nki,ni->nk", snbr, n_unit)
                      + d_plane[:, None])
    plane_fit_ok = jnp.all(dist_nb < 0.2, axis=1)
    sctr = jnp.mean(snbr, axis=1, keepdims=True)
    sdc = snbr - sctr
    scov = jnp.einsum("nki,nkj->nij", sdc, sdc) / k_surf
    slam0, slam1, _ = sym3_eigvals(scov)                 # closed form
    planar = slam1 > jnp.maximum(10.0 * slam0, 1e-4)
    plane_ok = (surf_mask & snear & plane_fit_ok & planar & finite_n
                & jnp.isfinite(sd2[:, -1]))

    return Correspondences(edge_pt=corner_src, edge_a=a, edge_b=b,
                           edge_ok=edge_ok, plane_pt=surf_src,
                           plane_n=n_unit, plane_d=d_plane,
                           plane_ok=plane_ok)


def _residuals(corr: Correspondences, p, q, huber_delta: float = 0.1):
    """Per-correspondence residuals + Huber weights at pose (p,q).

    Edge residual is A-LOAM's smooth 3-vector cross/‖ab‖ (lidarFactor.hpp
    LidarEdgeFactor) — the scalar ‖cross‖ has a non-differentiable kink at
    zero that NaNs forward-mode jacobians.  Huber weights are
    stop-gradiented (IRLS semantics).
    """
    pe = lie.quat_rotate(q[None, :], corr.edge_pt) + p[None, :]
    ab = corr.edge_b - corr.edge_a
    pa = pe - corr.edge_a
    cross = jnp.cross(pa, jnp.broadcast_to(ab, pa.shape))
    r_edge3 = cross / jnp.maximum(
        jnp.linalg.norm(ab, axis=-1, keepdims=True), 1e-9)    # (Ne,3)
    ps = lie.quat_rotate(q[None, :], corr.plane_pt) + p[None, :]
    r_plane = jnp.einsum("ni,ni->n", ps, corr.plane_n) + corr.plane_d

    def huber_w(a):
        return jnp.where(a <= huber_delta, 1.0,
                         jnp.sqrt(huber_delta / jnp.maximum(a, 1e-12)))

    e_norm = jax.lax.stop_gradient(
        jnp.sqrt(jnp.sum(r_edge3 * r_edge3, axis=-1) + 1e-12))
    we = huber_w(e_norm) * corr.edge_ok.astype(p.dtype)
    wp = huber_w(jax.lax.stop_gradient(jnp.abs(r_plane))) * \
        corr.plane_ok.astype(p.dtype)
    return r_edge3, we, r_plane, wp


@full_precision
def scan_to_map(corner_src, corner_mask, surf_src, surf_mask,
                corner_map, corner_map_mask, surf_map, surf_map_mask,
                p0, q0, outer_iters: int = 2, gn_iters: int = 4,
                max_corr_dist: float = 1.0,
                surf_i=None, surf_map_i=None):
    """Full LOAM scan-to-map alignment (outer: re-associate; inner: GN)."""
    dtype = corner_src.dtype

    def outer(carry, _):
        p, q = carry
        corr = find_correspondences(
            corner_src, corner_mask, surf_src, surf_mask,
            corner_map, corner_map_mask, surf_map, surf_map_mask,
            p, q, max_corr_dist, surf_i=surf_i, surf_map_i=surf_map_i)

        def inner(carry2, _):
            p2, q2 = carry2

            def res_fn(delta):
                pp = p2 + delta[3:6]
                qq = lie.quat_mul(q2, lie.quat_exp(delta[0:3]))
                re3, we, rp, wp = _residuals(corr, pp, qq)
                return jnp.concatenate([(re3 * we[:, None]).reshape(-1),
                                        rp * wp])

            zeros = jnp.zeros((6,), dtype)
            r = res_fn(zeros)
            J = jax.jacfwd(res_fn)(zeros)
            H = J.T @ J + 1e-6 * jnp.eye(6, dtype=dtype)
            g = -J.T @ r
            dx = jnp.linalg.solve(H, g)
            q3 = lie.quat_boxplus(q2, dx[0:3])
            p3 = p2 + dx[3:6]
            return (p3, q3), jnp.linalg.norm(dx)

        (p, q), dxs = jax.lax.scan(inner, (p, q), None, length=gn_iters)
        return (p, q), dxs[-1]

    (p, q), _ = jax.lax.scan(outer, (p0, q0), None, length=outer_iters)

    # diagnostics: final matched counts
    corr = find_correspondences(
        corner_src, corner_mask, surf_src, surf_mask,
        corner_map, corner_map_mask, surf_map, surf_map_mask, p, q,
        max_corr_dist, surf_i=surf_i, surf_map_i=surf_map_i)
    re3, we, rp, wp = _residuals(corr, p, q)
    n_edge = jnp.sum(corr.edge_ok)
    n_plane = jnp.sum(corr.plane_ok)
    mean_res = (jnp.sum(jnp.linalg.norm(re3, axis=-1) * corr.edge_ok)
                + jnp.sum(jnp.abs(rp) * corr.plane_ok)) / jnp.maximum(
        n_edge + n_plane, 1)
    return p, q, n_edge, n_plane, mean_res
