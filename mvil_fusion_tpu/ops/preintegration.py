"""IMU preintegration on TPU.

Re-design of the reference's `IntegrationBase` (reference:
vils_estimator/src/factor/integration_base.h:30-224): midpoint integration of
(Δp, Δq, Δv) with 15x15 first-order-bias Jacobian and 15x15 covariance,
plus the 15-dim residual used by the IMU factor
(integration_base.h:175-201).

TPU-first differences from the reference:

* The whole sample stream for one keyframe interval is integrated in a
  single `lax.scan` over fixed-capacity padded buffers (masked no-op steps),
  so one jit handles any number of raw samples without dynamic shapes.
* The state-transition matrix F (15x15) and noise matrix V (15x18) are not
  hand-derived; they are the exact forward-mode Jacobians of the midpoint
  step (jax.jacfwd), evaluated per step inside the scan.  This matches the
  reference's discrete linearization to first order by construction.
* Everything is batched: `vmap` over window intervals gives one fused kernel
  for all 6 preintegrations of the sliding window.

Error-state ordering matches the reference: [δp, δθ, δv, δba, δbg].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision

STATE_DIM = 15
NOISE_DIM = 18


class Preintegrated(NamedTuple):
    """Result of preintegrating one IMU interval (a pytree; vmap-able)."""

    dp: jnp.ndarray        # (3,) position delta in frame i
    dq: jnp.ndarray        # (4,) orientation delta (w,x,y,z)
    dv: jnp.ndarray        # (3,) velocity delta in frame i
    J: jnp.ndarray         # (15,15) d(state)/d(linearization point incl. bias)
    P: jnp.ndarray         # (15,15) covariance of the error state
    sum_dt: jnp.ndarray    # () total integrated time
    ba: jnp.ndarray        # (3,) linearization accel bias
    bg: jnp.ndarray        # (3,) linearization gyro bias


def noise_covariance(acc_n, gyr_n, acc_w, gyr_w, dtype=jnp.float32) -> jnp.ndarray:
    """18x18 continuous-ish noise covariance, diag([na0,ng0,na1,ng1,nba,nbg]),
    mirroring the reference's `noise` block (integration_base.h ctor)."""
    d = jnp.concatenate([
        jnp.full((3,), acc_n ** 2),
        jnp.full((3,), gyr_n ** 2),
        jnp.full((3,), acc_n ** 2),
        jnp.full((3,), gyr_n ** 2),
        jnp.full((3,), acc_w ** 2),
        jnp.full((3,), gyr_w ** 2),
    ]).astype(dtype)
    return jnp.diag(d)


def _midpoint_step(dp, dq, dv, ba, bg, acc0, gyr0, acc1, gyr1, dt, noise):
    """One midpoint step with additive measurement noise (18,).

    Mirrors integration_base.h midPointIntegration dynamics (the non-jacobian
    part, :54-88); noise layout [na0, ng0, na1, ng1, nba, nbg].
    """
    na0, ng0 = noise[0:3], noise[3:6]
    na1, ng1 = noise[6:9], noise[9:12]
    nba, nbg = noise[12:15], noise[15:18]
    un_gyr = 0.5 * (gyr0 + gyr1) - bg - 0.5 * (ng0 + ng1)
    dq_new = lie.quat_mul(dq, lie.quat_exp(un_gyr * dt))
    dq_new = lie.quat_normalize(dq_new)
    un_acc0 = lie.quat_rotate(dq, acc0 - ba - na0)
    un_acc1 = lie.quat_rotate(dq_new, acc1 - ba - na1)
    un_acc = 0.5 * (un_acc0 + un_acc1)
    dp_new = dp + dv * dt + 0.5 * un_acc * dt * dt
    dv_new = dv + un_acc * dt
    ba_new = ba + nba * dt
    bg_new = bg + nbg * dt
    return dp_new, dq_new, dv_new, ba_new, bg_new


def _step_jacobians(dp, dq, dv, ba, bg, acc0, gyr0, acc1, gyr1, dt):
    """Exact F (15x15) and V (15x18) of the midpoint step via forward AD.

    Local coordinates: right perturbation on dq; additive elsewhere.
    Replaces the hand-derived F/V of integration_base.h:90-126.
    """
    dtype = dp.dtype

    def local_step(delta, noise):
        p = dp + delta[0:3]
        q = lie.quat_mul(dq, lie.quat_exp(delta[3:6]))
        v = dv + delta[6:9]
        a = ba + delta[9:12]
        g = bg + delta[12:15]
        p2, q2, v2, a2, g2 = _midpoint_step(p, q, v, a, g,
                                            acc0, gyr0, acc1, gyr1, dt, noise)
        # Express output in local coords around the unperturbed output.
        p0, q0, v0, a0, g0 = _midpoint_step(dp, dq, dv, ba, bg,
                                            acc0, gyr0, acc1, gyr1, dt,
                                            jnp.zeros(NOISE_DIM, dtype))
        dth = lie.quat_log(lie.quat_mul(lie.quat_conj(q0), q2))
        return jnp.concatenate([p2 - p0, dth, v2 - v0, a2 - a0, g2 - g0])

    zeros_d = jnp.zeros(STATE_DIM, dtype)
    zeros_n = jnp.zeros(NOISE_DIM, dtype)
    F = jax.jacfwd(local_step, argnums=0)(zeros_d, zeros_n)
    V = jax.jacfwd(local_step, argnums=1)(zeros_d, zeros_n)
    return F, V


@full_precision
def preintegrate(acc: jnp.ndarray, gyr: jnp.ndarray, dt: jnp.ndarray,
                 ba: jnp.ndarray, bg: jnp.ndarray,
                 noise_cov: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> Preintegrated:
    """Preintegrate a (padded) IMU sample stream.

    Args:
      acc, gyr: (N, 3) raw measurements; consecutive pairs are midpoint-
        integrated, i.e. step k uses samples k and k+1 (N-1 steps).
      dt: (N,) where dt[k] is the time from sample k to k+1 (dt[N-1] unused
        but must exist; set 0).
      ba, bg: (3,) linearization biases.
      noise_cov: (18,18) from `noise_covariance`.
      mask: (N,) boolean; False entries are padding (their step is a no-op).
        Defaults to all-valid.  Padding must be trailing.

    Returns a `Preintegrated` pytree.
    """
    dtype = acc.dtype
    n = acc.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    step_mask = jnp.logical_and(mask[:-1], mask[1:])
    eff_dt = jnp.where(step_mask, dt[:-1], 0.0).astype(dtype)

    def scan_step(carry, x):
        dp, dq, dv, J, P, sum_dt = carry
        acc0, gyr0, acc1, gyr1, h, valid = x
        dp2, dq2, dv2, _, _ = _midpoint_step(
            dp, dq, dv, ba, bg, acc0, gyr0, acc1, gyr1, h,
            jnp.zeros(NOISE_DIM, dtype))
        F, V = _step_jacobians(dp, dq, dv, ba, bg, acc0, gyr0, acc1, gyr1, h)
        J2 = F @ J
        # V carries all dt factors via AD of the dynamics; noise_cov holds the
        # per-sample discrete stds squared, matching the reference's
        # P = F P Fᵀ + V Q Vᵀ with Q = diag(n²) (integration_base.h:124-126).
        P2 = F @ P @ F.T + V @ noise_cov @ V.T
        # masked no-op (h=0 already makes the step identity, but be explicit
        # so padding with garbage measurements is safe)
        dp2 = jnp.where(valid, dp2, dp)
        dq2 = jnp.where(valid, dq2, dq)
        dv2 = jnp.where(valid, dv2, dv)
        J2 = jnp.where(valid, J2, J)
        P2 = jnp.where(valid, P2, P)
        sum_dt = sum_dt + h
        return (dp2, dq2, dv2, J2, P2, sum_dt), None

    init = (
        jnp.zeros(3, dtype), lie.quat_identity(dtype), jnp.zeros(3, dtype),
        jnp.eye(STATE_DIM, dtype=dtype), jnp.zeros((STATE_DIM, STATE_DIM), dtype),
        jnp.zeros((), dtype),
    )
    xs = (acc[:-1], gyr[:-1], acc[1:], gyr[1:], eff_dt, step_mask)
    (dp, dq, dv, J, P, sum_dt), _ = jax.lax.scan(scan_step, init, xs)
    return Preintegrated(dp=dp, dq=dq, dv=dv, J=J, P=P, sum_dt=sum_dt,
                         ba=ba, bg=bg)


# vmap over window intervals: one fused kernel for all preintegrations.
preintegrate_batch = jax.vmap(preintegrate,
                              in_axes=(0, 0, 0, 0, 0, None, 0))


def bias_corrected_delta(pre: Preintegrated, ba_new: jnp.ndarray,
                         bg_new: jnp.ndarray):
    """First-order bias correction of (Δp, Δq, Δv)
    (reference: integration_base.h evaluate :175-189)."""
    dba = ba_new - pre.ba
    dbg = bg_new - pre.bg
    dp_dba = pre.J[0:3, 9:12]
    dp_dbg = pre.J[0:3, 12:15]
    dq_dbg = pre.J[3:6, 12:15]
    dv_dba = pre.J[6:9, 9:12]
    dv_dbg = pre.J[6:9, 12:15]
    dp = pre.dp + dp_dba @ dba + dp_dbg @ dbg
    dv = pre.dv + dv_dba @ dba + dv_dbg @ dbg
    dq = lie.quat_mul(pre.dq, lie.quat_exp(dq_dbg @ dbg))
    return dp, lie.quat_normalize(dq), dv


def imu_residual(pre: Preintegrated,
                 p_i, q_i, v_i, ba_i, bg_i,
                 p_j, q_j, v_j, ba_j, bg_j,
                 gravity) -> jnp.ndarray:
    """15-dim unweighted IMU residual (integration_base.h:175-201).

    gravity: (3,) world gravity vector G (positive up-magnitude, e.g.
    [0,0,9.795]); dynamics are v̇ = R a_m - G.
    """
    dp, dq, dv = bias_corrected_delta(pre, ba_i, bg_i)
    dt = pre.sum_dt
    qi_inv = lie.quat_conj(q_i)
    r_p = lie.quat_rotate(qi_inv, 0.5 * gravity * dt * dt + p_j - p_i - v_i * dt) - dp
    r_q = 2.0 * lie.quat_mul(lie.quat_conj(dq), lie.quat_mul(qi_inv, q_j))[1:4]
    r_v = lie.quat_rotate(qi_inv, gravity * dt + v_j - v_i) - dv
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg])


def sqrt_information(pre: Preintegrated, eps: float = 1e-8) -> jnp.ndarray:
    """Upper-triangular sqrt information from the covariance
    (Cholesky of P^{-1}; reference imu_factor.h uses LLT of P.inverse())."""
    P = pre.P + eps * jnp.eye(STATE_DIM, dtype=pre.P.dtype)
    # Solve via Cholesky of P: P = L Lᵀ  ⇒  P⁻¹ = L⁻ᵀ L⁻¹, sqrt-info = L⁻¹.
    L = jnp.linalg.cholesky(P)
    return jax.scipy.linalg.solve_triangular(
        L, jnp.eye(STATE_DIM, dtype=P.dtype), lower=True)


def propagate_state(p, q, v, ba, bg, acc0, gyr0, acc1, gyr1, dt, gravity):
    """World-frame midpoint propagation for IMU-rate pose prediction
    (reference: estimator_node.cpp predict() :52-77)."""
    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    q_new = lie.quat_normalize(lie.quat_mul(q, lie.quat_exp(un_gyr * dt)))
    un_acc0 = lie.quat_rotate(q, acc0 - ba) - gravity
    un_acc1 = lie.quat_rotate(q_new, acc1 - ba) - gravity
    un_acc = 0.5 * (un_acc0 + un_acc1)
    p_new = p + v * dt + 0.5 * un_acc * dt * dt
    v_new = v + un_acc * dt
    return p_new, q_new, v_new
