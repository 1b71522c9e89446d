"""LiDAR constraint factors for the sliding-window BA.

Faithful re-implementations of the reference's Ceres autodiff factors
(reference: vils_estimator/src/lidar_backend.h):

* `LidarICPConstraint_b` (:97-184): scan-to-scan relative translation,
  4 window poses (a,b bracket sweep i; c,d bracket sweep j), slerp/lerp
  interpolation to the sweep timestamps, residual on the x/z components of
  Qj⁻¹Qi (PIJ − Qi⁻¹(Pj−Pi)) scaled by sqrt_info (y is zeroed).
* `LPSConstraint` (:35-95): rotation-only pull toward the global-mapping
  localizer pose, 2 bracketing poses, residual 2·vec(Qi⁻¹ Q_meas)/0.01.
* zero-velocity freeze (mode 4): strong prior pinning the second-newest
  frame's pose and zeroing its velocity (reference estimator.cpp:1354-1375
  SetParameterBlockConstant + v=0).

All constraint slots are static-capacity with masks; factors are built as
dense rows (E, D) compatible with BAProblem.extra_J/extra_r.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.estimator import state as st
from mvil_fusion_tpu.utils import lie

MAX_ICP = 5     # reference: LidarICPConstraints list ≤ 5
MAX_LPS = 7     # reference: LidarLPSConstraints list ≤ 7


class IcpConstraints(NamedTuple):
    """Static-capacity 4-pose ICP constraint table (a pytree)."""

    ids: jnp.ndarray        # (C,4) int32 window indices a,b,c,d
    alpha_i: jnp.ndarray    # (C,) (ti-ta)/(tb-ta)
    alpha_j: jnp.ndarray    # (C,) (tj-tc)/(td-tc)
    trans_p: jnp.ndarray    # (C,3) measured relative translation (body)
    weight: jnp.ndarray     # (C,) sqrt_info scalar (100/fitness)
    active: jnp.ndarray     # (C,) bool (mode == 3 and ids found)


class LpsConstraints(NamedTuple):
    ids: jnp.ndarray        # (L,2) int32 bracketing window indices
    alpha: jnp.ndarray      # (L,)
    q_meas: jnp.ndarray     # (L,4) measured body orientation (world)
    active: jnp.ndarray     # (L,)


def empty_icp(dtype=jnp.float32) -> IcpConstraints:
    C = MAX_ICP
    return IcpConstraints(
        ids=jnp.zeros((C, 4), jnp.int32),
        alpha_i=jnp.zeros((C,), dtype), alpha_j=jnp.zeros((C,), dtype),
        trans_p=jnp.zeros((C, 3), dtype), weight=jnp.zeros((C,), dtype),
        active=jnp.zeros((C,), bool))


def empty_lps(dtype=jnp.float32) -> LpsConstraints:
    L = MAX_LPS
    return LpsConstraints(
        ids=jnp.zeros((L, 2), jnp.int32), alpha=jnp.zeros((L,), dtype),
        q_meas=jnp.tile(lie.quat_identity(dtype), (L, 1)),
        active=jnp.zeros((L,), bool))


def _one_hot6(idx, D, dtype):
    base6 = jnp.arange(6, dtype=jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (6, D), 1)
    return (cols == (15 * idx + base6)[:, None]).astype(dtype)


def icp_system(s: st.WindowState, c: IcpConstraints):
    """(3·C, D) weighted jacobian rows + residuals at the current state."""
    W = s.window
    D = st.pose_dim(W)
    dtype = s.p.dtype

    def one(ids, ai, aj, t_meas, w, act):
        a, b, cc, d = ids[0], ids[1], ids[2], ids[3]

        def local_res(delta):
            pa = s.p[a] + delta[0:3]
            qa = lie.quat_mul(s.q[a], lie.quat_exp(delta[3:6]))
            pb = s.p[b] + delta[6:9]
            qb = lie.quat_mul(s.q[b], lie.quat_exp(delta[9:12]))
            pc = s.p[cc] + delta[12:15]
            qc = lie.quat_mul(s.q[cc], lie.quat_exp(delta[15:18]))
            pd = s.p[d] + delta[18:21]
            qd = lie.quat_mul(s.q[d], lie.quat_exp(delta[21:24]))
            Qi = lie.quat_slerp(qa, qb, ai)
            Qj = lie.quat_slerp(qc, qd, aj)
            Pi = pa + (pb - pa) * ai
            Pj = pc + (pd - pc) * aj
            temQ = lie.quat_mul(lie.quat_conj(Qj), Qi)
            temP = lie.quat_rotate_inv(Qi, Pj - Pi)
            res = lie.quat_rotate(temQ, t_meas - temP)
            # x/z only, y zeroed (lidar_backend.h:158-161)
            return jnp.stack([res[0], jnp.zeros((), dtype), res[2]]) * w

        zeros = jnp.zeros((24,), dtype)
        r = local_res(zeros)
        J = jax.jacfwd(local_res)(zeros)           # (3,24)
        Sg = jnp.concatenate([_one_hot6(ids[k], D, dtype)
                              for k in range(4)], axis=0)  # (24,D)
        Jg = J @ Sg
        # Cauchy IRLS weight — the reference adds these blocks with the
        # problem-wide robust loss (estimator.cpp:1129, :1395), which caps
        # a disagreeing ICP measurement's influence.  c = 2.3849 (the 95%%-
        # efficiency tuning the reference carries at estimator.cpp:1130).
        c2 = 2.3849 ** 2
        w_rob = jnp.sqrt(1.0 / (1.0 + jnp.sum(r * r) / c2))
        m = act.astype(dtype) * w_rob
        return Jg * m, r * m

    Jg, r = jax.vmap(one)(c.ids, c.alpha_i, c.alpha_j, c.trans_p,
                          c.weight, c.active)
    return Jg.reshape(-1, D), r.reshape(-1)


def lps_system(s: st.WindowState, c: LpsConstraints,
               sigma: float = 0.01):
    """(3·L, D) rotation-only LPS rows (lidar_backend.h:35-95)."""
    W = s.window
    D = st.pose_dim(W)
    dtype = s.p.dtype

    def one(ids, a, q_meas, act):
        l, r_ = ids[0], ids[1]

        def local_res(delta):
            ql = lie.quat_mul(s.q[l], lie.quat_exp(delta[0:3]))
            qr = lie.quat_mul(s.q[r_], lie.quat_exp(delta[3:6]))
            Qi = lie.quat_slerp(ql, qr, a)
            q12 = lie.quat_mul(lie.quat_conj(Qi), q_meas)
            return 2.0 * q12[1:4] / sigma

        zeros = jnp.zeros((6,), dtype)
        r = local_res(zeros)
        J = jax.jacfwd(local_res)(zeros)           # (3,6)
        cols_l = _one_hot6(l, D, dtype)[3:6]       # rotation cols of l
        cols_r = _one_hot6(r_, D, dtype)[3:6]
        Jg = J[:, 0:3] @ cols_l + J[:, 3:6] @ cols_r
        # Cauchy IRLS weight (reference estimator.cpp:1129,:1322 adds the
        # LPS block under the robust loss): at sigma=0.01 a few-degree
        # orientation disagreement is a |r|~5-10 row — unrobustified it
        # drags the whole window and leaks into the accel bias (|ba| 0.5 →
        # 1.6-3.5 m/s² observed).  c = 2.3849 as above.
        c2 = 2.3849 ** 2
        w_rob = jnp.sqrt(1.0 / (1.0 + jnp.sum(r * r) / c2))
        m = act.astype(dtype) * w_rob
        return Jg * m, r * m

    Jg, r = jax.vmap(one)(c.ids, c.alpha, c.q_meas, c.active)
    return Jg.reshape(-1, D), r.reshape(-1)


def zero_velocity_system(s: st.WindowState, active, weight: float = 1e4):
    """(9, D) rows freezing frame W-2's pose at its current estimate and its
    velocity at zero (reference mode-4 handling, estimator.cpp:1354-1375)."""
    W = s.window
    D = st.pose_dim(W)
    dtype = s.p.dtype
    k = W - 2
    m = jnp.asarray(active).astype(dtype) * weight
    # rows: δp(3) [pin], δθ(3) [pin], v(3) [drive to zero]
    J = jnp.zeros((9, D), dtype)
    J = J.at[0:6, 15 * k:15 * k + 6].set(jnp.eye(6, dtype=dtype) * m)
    J = J.at[6:9, 15 * k + 6:15 * k + 9].set(jnp.eye(3, dtype=dtype) * m)
    r = jnp.concatenate([jnp.zeros((6,), dtype), s.v[k] * m])
    return J, r
