"""Factor residuals + batched Gauss-Newton system assembly for the sliding
window, replacing the reference's Ceres cost functions:

* projection-with-td factor   (reference: vils_estimator/src/factor/
  projection_td_factor.cpp, sqrt_info = FOCAL/2·I, estimator.cpp:18-19)
* IMU preintegration factor   (reference: factor/imu_factor.h:12-189)
* marginalization prior       (reference: factor/marginalization_factor.cpp)
* Cauchy robust loss on vision (reference: estimator.cpp:1129)

TPU-first design: every factor family is evaluated as one `vmap` over a
static-capacity table, with Jacobians from forward-mode AD of the residual
w.r.t. the factor's *local* parameters (exact analytic linearization at the
current estimate), scattered into the global packed layout with one-hot
matmuls so assembly is matmul-shaped for the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.estimator import state as st
from mvil_fusion_tpu.ops import preintegration as pre
from mvil_fusion_tpu.utils import lie


# ---------------------------------------------------------------------------
# Projection (vision) factor with td
# ---------------------------------------------------------------------------

def proj_residual(p_i, q_i, p_j, q_j, tic, qic, inv_dep, td,
                  obs_i, vel_i, obs_j, vel_j, td_ref_i, td_ref_j):
    """2-dim reprojection residual of one (feature, frame-j) pair.

    Mirrors ProjectionTdFactor::Evaluate (reference:
    factor/projection_td_factor.cpp): the feature is parameterized by inverse
    depth in its start frame i; both observations are velocity-compensated by
    the current time-offset estimate.
    """
    pts_i = obs_i - (td - td_ref_i) * vel_i
    pts_j = obs_j - (td - td_ref_j) * vel_j
    pts_cam_i = jnp.concatenate([pts_i, jnp.ones_like(pts_i[:1])]) / inv_dep
    pts_imu_i = lie.quat_rotate(qic, pts_cam_i) + tic
    pts_w = lie.quat_rotate(q_i, pts_imu_i) + p_i
    pts_imu_j = lie.quat_rotate_inv(q_j, pts_w - p_j)
    pts_cam_j = lie.quat_rotate_inv(qic, pts_imu_j - tic)
    z = pts_cam_j[2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, jnp.sign(z) * 1e-6 + 1e-12, z)
    return pts_cam_j[:2] / safe_z - pts_j


def _one_hot_cols(idx_offsets: jnp.ndarray, dim: int, dtype) -> jnp.ndarray:
    """(k, dim) selection matrix: row r is one-hot at idx_offsets[r]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_offsets.shape[0], dim), 1)
    return (cols == idx_offsets[:, None]).astype(dtype)


class VisionSystem(NamedTuple):
    Jg: jnp.ndarray    # (N,2,D) global pose-side jacobians (weighted)
    Jl: jnp.ndarray    # (N,2)   landmark jacobians (weighted)
    r: jnp.ndarray     # (N,2)   whitened+weighted residuals
    fidx: jnp.ndarray  # (N,)    feature slot of each factor
    w: jnp.ndarray     # (N,)    active mask as float (0 inactive)
    cost: jnp.ndarray  # ()      robust cost total


def vision_system(s: st.WindowState, f: st.Features, focal: float,
                  cauchy_c: float = 1.0) -> VisionSystem:
    """Evaluate all (feature, observing-frame) projection factors.

    Returns weighted jacobians/residuals; factors where frame j == start
    frame or unobserved are masked to zero.  N = F * W.
    """
    W = s.window
    F = f.start.shape[0]
    D = st.pose_dim(W)
    dtype = s.p.dtype
    sqrt_info = focal / 2.0

    fidx = jnp.repeat(jnp.arange(F, dtype=jnp.int32), W)       # (N,)
    jidx = jnp.tile(jnp.arange(W, dtype=jnp.int32), F)          # (N,)
    iidx = f.start[fidx]                                        # (N,)

    # gather per-factor quantities
    p_i, q_i = s.p[iidx], s.q[iidx]
    p_j, q_j = s.p[jidx], s.q[jidx]
    lam = s.inv_depth[fidx]
    obs_i = f.obs[fidx, iidx]
    vel_i = f.vel[fidx, iidx]
    tdr_i = f.td_ref[fidx, iidx]
    obs_j = f.obs[fidx, jidx]
    vel_j = f.vel[fidx, jidx]
    tdr_j = f.td_ref[fidx, jidx]

    active = (f.valid[fidx]
              & f.mask[fidx, iidx]
              & f.mask[fidx, jidx]
              & (jidx != iidx))

    def local_res(delta, pi, qi, pj, qj, lam_, obs_i, vel_i, obs_j, vel_j,
                  tdr_i, tdr_j):
        """residual as fn of 21 local params:
        [δpose_i(6), δpose_j(6), δext(6), δλ(1), δtd(1), pad(1)]"""
        pi2 = pi + delta[0:3]
        qi2 = lie.quat_mul(qi, lie.quat_exp(delta[3:6]))
        pj2 = pj + delta[6:9]
        qj2 = lie.quat_mul(qj, lie.quat_exp(delta[9:12]))
        tic2 = s.tic + delta[12:15]
        qic2 = lie.quat_mul(s.qic, lie.quat_exp(delta[15:18]))
        lam2 = lam_ + delta[18]
        td2 = s.td + delta[19]
        return proj_residual(pi2, qi2, pj2, qj2, tic2, qic2, lam2, td2,
                             obs_i, vel_i, obs_j, vel_j, tdr_i, tdr_j)

    zeros = jnp.zeros((20,), dtype)

    def per_factor(pi, qi, pj, qj, lam_, oi, vi, oj, vj, ti, tj):
        r = local_res(zeros, pi, qi, pj, qj, lam_, oi, vi, oj, vj, ti, tj)
        J = jax.jacfwd(local_res)(zeros, pi, qi, pj, qj, lam_, oi, vi, oj,
                                  vj, ti, tj)
        return r, J

    r, J = jax.vmap(per_factor)(p_i, q_i, p_j, q_j, lam, obs_i, vel_i,
                                obs_j, vel_j, tdr_i, tdr_j)   # (N,2), (N,2,20)
    r = r * sqrt_info
    J = J * sqrt_info

    # robust (Cauchy) IRLS weight on the whitened squared norm
    s2 = jnp.sum(r * r, axis=-1)
    w_robust = 1.0 / (1.0 + s2 / (cauchy_c ** 2))
    w = jnp.where(active, w_robust, 0.0).astype(dtype)
    cost = jnp.sum(jnp.where(active,
                             0.5 * cauchy_c ** 2 * jnp.log1p(s2 / cauchy_c ** 2),
                             0.0))

    # scatter local pose jacobians to global columns via one-hot matmuls
    eoff = st.ext_offset(W)
    toff = st.td_offset(W)
    base6 = jnp.arange(6, dtype=jnp.int32)

    def scatter(Jf, i, jx):
        Si = _one_hot_cols(15 * i + base6, D, dtype)       # (6,D)
        Sj = _one_hot_cols(15 * jx + base6, D, dtype)      # (6,D)
        Se = _one_hot_cols(eoff + base6, D, dtype)
        Stt = _one_hot_cols(jnp.array([toff], jnp.int32), D, dtype)
        return (Jf[:, 0:6] @ Si + Jf[:, 6:12] @ Sj + Jf[:, 12:18] @ Se
                + Jf[:, 19:20] @ Stt)

    Jg = jax.vmap(scatter)(J, iidx, jidx)                   # (N,2,D)
    Jl = J[:, :, 18]                                        # (N,2)

    sw = jnp.sqrt(w)[:, None]
    return VisionSystem(Jg=Jg * sw[..., None], Jl=Jl * sw, r=r * sw,
                        fidx=fidx, w=w, cost=cost)


# ---------------------------------------------------------------------------
# IMU factors
# ---------------------------------------------------------------------------

class DenseSystem(NamedTuple):
    """A stack of factors already in global coordinates."""

    J: jnp.ndarray    # (M, D) rows of the weighted jacobian
    r: jnp.ndarray    # (M,)   weighted residuals
    cost: jnp.ndarray


def imu_system(s: st.WindowState, preints: pre.Preintegrated,
               interval_mask: jnp.ndarray, gravity: jnp.ndarray
               ) -> DenseSystem:
    """All W-1 consecutive-frame IMU factors as one batched evaluation.

    preints: Preintegrated with leading axis (W-1,) for intervals k→k+1.
    interval_mask: (W-1,) bool — inactive intervals contribute zero.
    """
    W = s.window
    D = st.pose_dim(W)
    dtype = s.p.dtype
    nI = W - 1

    def local_res(delta, k):
        """residual as fn of the 30 local params of frames k, k+1."""
        di, dj = delta[:15], delta[15:]
        pi = s.p[k] + di[0:3]
        qi = lie.quat_mul(s.q[k], lie.quat_exp(di[3:6]))
        vi = s.v[k] + di[6:9]
        bai = s.ba[k] + di[9:12]
        bgi = s.bg[k] + di[12:15]
        pj = s.p[k + 1] + dj[0:3]
        qj = lie.quat_mul(s.q[k + 1], lie.quat_exp(dj[3:6]))
        vj = s.v[k + 1] + dj[6:9]
        baj = s.ba[k + 1] + dj[9:12]
        bgj = s.bg[k + 1] + dj[12:15]
        pk = jax.tree.map(lambda x: x[k], preints)
        r = pre.imu_residual(pk, pi, qi, vi, bai, bgi,
                             pj, qj, vj, baj, bgj, gravity)
        si = pre.sqrt_information(pk)
        return si @ r

    zeros = jnp.zeros((30,), dtype)
    ks = jnp.arange(nI)

    def per_interval(k):
        r = local_res(zeros, k)
        J = jax.jacfwd(local_res)(zeros, k)
        return r, J

    r, J = jax.vmap(per_interval)(ks)          # (nI,15), (nI,15,30)
    m = interval_mask.astype(dtype)[:, None]
    r = r * m
    J = J * m[..., None]

    # static scatter: interval k occupies global columns [15k, 15k+30)
    Jg = jnp.zeros((nI, 15, D), dtype)
    for k in range(nI):
        Jg = Jg.at[k, :, 15 * k:15 * k + 30].set(J[k])
    cost = 0.5 * jnp.sum(r * r)
    return DenseSystem(J=Jg.reshape(nI * 15, D), r=r.reshape(-1), cost=cost)


# ---------------------------------------------------------------------------
# Marginalization prior factor
# ---------------------------------------------------------------------------

class Prior(NamedTuple):
    """Linearized Gaussian prior  r(x) = r0 + J0 (x ⊟ x0)  over the packed
    pose-side parameters (reference: MarginalizationFactor)."""

    J: jnp.ndarray          # (Np, D)
    r0: jnp.ndarray         # (Np,)
    x0: st.WindowState      # linearization point
    valid: jnp.ndarray      # () bool — inactive before first marginalization


def empty_prior(w: int, f: int, dtype=jnp.float32) -> Prior:
    D = st.pose_dim(w)
    return Prior(J=jnp.zeros((D, D), dtype), r0=jnp.zeros((D,), dtype),
                 x0=st.make_window_state(w, f, dtype),
                 valid=jnp.zeros((), bool))


def prior_system(prior: Prior, s: st.WindowState) -> DenseSystem:
    dx = st.state_boxminus(s, prior.x0)
    active = prior.valid.astype(s.p.dtype)
    r = (prior.r0 + prior.J @ dx) * active
    J = prior.J * active
    return DenseSystem(J=J, r=r, cost=0.5 * jnp.sum(r * r))


# ---------------------------------------------------------------------------
# Anchor (gauge) factor — used before the first marginalization prior exists
# ---------------------------------------------------------------------------

def anchor_system(s: st.WindowState, s_ref: st.WindowState,
                  weight: float, active) -> DenseSystem:
    """Soft prior pinning frame-0 position and yaw of `s` to `s_ref`,
    removing the 4 unobservable dofs when no marginalization prior exists.
    The reference handles this implicitly via its prior + double2vector yaw
    rewind (estimator.cpp:960-1074); we do both."""
    W = s.window
    D = st.pose_dim(W)
    dtype = s.p.dtype
    a = jnp.asarray(active).astype(dtype) * weight

    def res(delta):
        p0 = s.p[0] + delta[0:3]
        q0 = lie.quat_mul(s.q[0], lie.quat_exp(delta[3:6]))
        dp = p0 - s_ref.p[0]
        dth = lie.quat_boxminus(q0, s_ref.q[0])
        return jnp.concatenate([dp, dth])

    zeros = jnp.zeros((6,), dtype)
    r = res(zeros) * a
    J6 = jax.jacfwd(res)(zeros) * a
    J = jnp.zeros((6, D), dtype).at[:, 0:6].set(J6)
    return DenseSystem(J=J, r=r, cost=0.5 * jnp.sum(r * r))
