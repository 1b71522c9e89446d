"""SO(3)/SE(3)/quaternion math for the TPU-native VIL-SLAM engine.

All functions are pure jax.numpy, dtype-preserving, and batched over leading
dimensions (quaternion/vector data lives in the trailing dimension), so they
can be freely `vmap`-ed and used inside `jit`/`pallas` code.

Conventions
-----------
* Quaternions are Hamilton, stored ``(w, x, y, z)``, unit norm, acting as
  ``v' = q ⊗ v ⊗ q*`` (i.e. ``quat_rotate(q, v) == quat_to_mat(q) @ v``).
* Pose perturbations are *right* (body-frame) perturbations:
  ``q ⊞ δθ = q ⊗ exp(δθ/2)`` — matching the reference's Ceres pose local
  parameterization (reference: vils_estimator/src/factor/
  pose_local_parameterization.cpp:3-27) and its ``Utility::deltaQ``
  (reference: vils_estimator/src/utility/utility.h).
* ``g2R`` reproduces the reference's gravity alignment with zeroed yaw
  (reference: vils_estimator/src/utility/utility.cpp g2R).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_canonical(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so w >= 0 (double cover canonicalization)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.  v' = R(q) v."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → quaternion (w,x,y,z), branch-free (Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q*q_k formulations; pick the numerically largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0 + _EPS),
                    (m02 - m20) / (4 * qw0 + _EPS),
                    (m10 - m01) / (4 * qw0 + _EPS)], axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2
    c1 = jnp.stack([(m21 - m12) / (4 * qx1 + _EPS), qx1,
                    (m01 + m10) / (4 * qx1 + _EPS),
                    (m02 + m20) / (4 * qx1 + _EPS)], axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2
    c2 = jnp.stack([(m02 - m20) / (4 * qy2 + _EPS),
                    (m01 + m10) / (4 * qy2 + _EPS), qy2,
                    (m12 + m21) / (4 * qy2 + _EPS)], axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2
    c3 = jnp.stack([(m10 - m01) / (4 * qz3 + _EPS),
                    (m02 + m20) / (4 * qz3 + _EPS),
                    (m12 + m21) / (4 * qz3 + _EPS), qz3], axis=-1)

    # Pivot selection identical to the classic branchy algorithm.
    use0 = tr > 0
    use1 = jnp.logical_and(~use0, jnp.logical_and(m00 >= m11, m00 >= m22))
    use2 = jnp.logical_and(~use0, jnp.logical_and(~use1, m11 >= m22))
    q = jnp.where(use0[..., None], c0,
                  jnp.where(use1[..., None], c1,
                            jnp.where(use2[..., None], c2, c3)))
    return quat_normalize(quat_canonical(q))


def quat_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (axis*angle, 3) → quaternion.

    Taylor-safe at the origin.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    small = theta2 < 1e-8
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    s = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([w, s * phi], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Log map: quaternion → rotation vector (3,). Angle in [0, pi]."""
    q = quat_canonical(quat_normalize(q))
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    qv = q[..., 1:]
    n = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / jnp.maximum(n, _EPS))
    return scale * qv


def delta_q(theta: jnp.ndarray) -> jnp.ndarray:
    """First-order quaternion from a small angle: [1, θ/2] (unnormalized ok).

    Mirrors the reference's Utility::deltaQ used throughout preintegration
    (reference: vils_estimator/src/utility/utility.h).
    """
    half = 0.5 * theta
    one = jnp.ones(theta.shape[:-1] + (1,), dtype=theta.dtype)
    return quat_normalize(jnp.concatenate([one, half], axis=-1))


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation, shortest arc, lerp fallback for tiny angles."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(d, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t, dtype=q0.dtype)
    t = t[..., None] if t.ndim < d.ndim else t
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)


def quat_boxplus(q: jnp.ndarray, dtheta: jnp.ndarray) -> jnp.ndarray:
    """Right (body-frame) perturbation: q ⊗ exp(δθ)."""
    return quat_normalize(quat_mul(q, quat_exp(dtheta)))


def quat_boxminus(q1: jnp.ndarray, q0: jnp.ndarray) -> jnp.ndarray:
    """Local difference: log(q0^{-1} ⊗ q1)."""
    return quat_log(quat_mul(quat_conj(q0), q1))


# ---------------------------------------------------------------------------
# so(3) matrix forms
# ---------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector → rotation matrix (Rodrigues, Taylor-safe)."""
    return quat_to_mat(quat_exp(phi))


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    return quat_log(mat_to_quat(R))


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): exp((phi+dphi)^) ≈ exp(J_l dphi ^) exp(phi^)."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = skew(phi)
    K2 = K @ K
    I = jnp.eye(3, dtype=phi.dtype)
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    return I + a * K + b * K2


def so3_right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    return so3_left_jacobian(-phi)


# ---------------------------------------------------------------------------
# SE(3) poses as (p[3], q[4]) pairs
# ---------------------------------------------------------------------------

def pose_compose(p1, q1, p2, q2):
    """T1 * T2 for T = (p, q): (p1 + R1 p2, q1 q2)."""
    return p1 + quat_rotate(q1, p2), quat_normalize(quat_mul(q1, q2))


def pose_inverse(p, q):
    qi = quat_conj(q)
    return -quat_rotate(qi, p), qi


def pose_apply(p, q, x):
    """Transform point(s) x by pose (p, q)."""
    return quat_rotate(q, x) + p


def pose_between(p1, q1, p2, q2):
    """T1^{-1} * T2."""
    qi = quat_conj(q1)
    return quat_rotate(qi, p2 - p1), quat_normalize(quat_mul(qi, q2))


# ---------------------------------------------------------------------------
# Euler / gravity helpers (reference semantics)
# ---------------------------------------------------------------------------

def mat_to_ypr(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → (yaw, pitch, roll) in radians, ZYX convention.

    Matches Utility::R2ypr of the reference (degrees there; radians here).
    """
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arctan2(-R[..., 2, 0],
                        R[..., 0, 0] * jnp.cos(yaw) + R[..., 1, 0] * jnp.sin(yaw))
    roll = jnp.arctan2(R[..., 0, 2] * jnp.sin(yaw) - R[..., 1, 2] * jnp.cos(yaw),
                       -R[..., 0, 1] * jnp.sin(yaw) + R[..., 1, 1] * jnp.cos(yaw))
    return jnp.stack([yaw, pitch, roll], axis=-1)


def ypr_to_mat(ypr: jnp.ndarray) -> jnp.ndarray:
    """(yaw, pitch, roll) radians → rotation matrix, R = Rz(y) Ry(p) Rx(r)."""
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def g2R(g: jnp.ndarray) -> jnp.ndarray:
    """Rotation R0 aligning measured gravity direction g to +z with zero yaw.

    R0 @ normalize(g) == [0,0,1]; yaw(R0) == 0.  Mirrors Utility::g2R
    (reference: vils_estimator/src/utility/utility.cpp).
    """
    ng1 = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), _EPS)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # Rotation taking ng1 to ng2 (axis = ng1 × ng2).
    axis = jnp.cross(ng1, ng2)
    s = jnp.linalg.norm(axis, axis=-1)
    c = jnp.sum(ng1 * ng2, axis=-1)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s[..., None], _EPS)
    R0 = so3_exp(axis * angle[..., None])
    # Zero out yaw.
    yaw = mat_to_ypr(R0)[..., 0]
    ypr = jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1)
    return ypr_to_mat(ypr) @ R0
