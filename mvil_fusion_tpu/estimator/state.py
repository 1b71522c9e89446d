"""Sliding-window state layout for the TPU-native VIO estimator.

Replaces the reference's scattered `para_Pose / para_SpeedBias / para_Feature
/ para_Ex_Pose / para_Td` Ceres parameter blocks (reference:
vils_estimator/src/estimator.cpp vector2double/double2vector :906-1074) with
one fixed-shape pytree and a single packed local-delta vector.

Local-delta layout (dimension D = 15*W + 6 + 1):
  frame k (k = 0..W-1): [δp(3), δθ(3), δv(3), δba(3), δbg(3)] at offset 15k
  camera-IMU extrinsic: [δt(3), δθ(3)] at offset 15W
  time offset td:       [δtd]          at offset 15W + 6
Landmark inverse depths are a separate (F,) vector, Schur-eliminated in the
solver.  All shapes are static; invalid slots are masked.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mvil_fusion_tpu.utils import lie


def frame_offset(k: int) -> int:
    return 15 * k


def ext_offset(w: int) -> int:
    return 15 * w


def td_offset(w: int) -> int:
    return 15 * w + 6


def pose_dim(w: int) -> int:
    """Total pose-side local dimension D."""
    return 15 * w + 7


class WindowState(NamedTuple):
    """All optimizable state of the sliding window (a pytree)."""

    p: jnp.ndarray    # (W,3) body position in world
    q: jnp.ndarray    # (W,4) body orientation (w,x,y,z)
    v: jnp.ndarray    # (W,3) velocity in world
    ba: jnp.ndarray   # (W,3) accel bias
    bg: jnp.ndarray   # (W,3) gyro bias
    tic: jnp.ndarray  # (3,) camera-in-IMU translation
    qic: jnp.ndarray  # (4,) camera-in-IMU rotation
    td: jnp.ndarray   # () camera-IMU time offset
    inv_depth: jnp.ndarray  # (F,) landmark inverse depths (start-frame)

    @property
    def window(self) -> int:
        return self.p.shape[0]

    @property
    def num_features(self) -> int:
        return self.inv_depth.shape[0]


def make_window_state(w: int, f: int, dtype=jnp.float32) -> WindowState:
    return WindowState(
        p=jnp.zeros((w, 3), dtype),
        q=jnp.tile(lie.quat_identity(dtype), (w, 1)),
        v=jnp.zeros((w, 3), dtype),
        ba=jnp.zeros((w, 3), dtype),
        bg=jnp.zeros((w, 3), dtype),
        tic=jnp.zeros((3,), dtype),
        qic=lie.quat_identity(dtype),
        td=jnp.zeros((), dtype),
        inv_depth=jnp.ones((f,), dtype),
    )


class Features(NamedTuple):
    """Per-landmark observation table over the window (static shapes).

    Mirrors the reference's FeatureManager per-id track list
    (reference: vils_estimator/src/feature_manager.h:19-75) flattened to a
    dense (F, W) table.
    """

    start: jnp.ndarray       # (F,) int32 reference (host) frame index
    obs: jnp.ndarray         # (F,W,2) normalized undistorted coords
    vel: jnp.ndarray         # (F,W,2) normalized-plane velocity (for td)
    td_ref: jnp.ndarray      # (F,W) td estimate at packaging time
    mask: jnp.ndarray        # (F,W) bool: observed in frame w
    depth_fixed: jnp.ndarray  # (F,) bool: lidar-measured depth, hold constant
    valid: jnp.ndarray       # (F,) bool: slot in use (and in the problem)


def apply_delta(s: WindowState, dx: jnp.ndarray,
                dl: jnp.ndarray | None = None) -> WindowState:
    """Boxplus: apply a packed pose-side delta (D,) and optional landmark
    delta (F,)."""
    w = s.window
    dxf = dx[: 15 * w].reshape(w, 15)
    p = s.p + dxf[:, 0:3]
    q = lie.quat_normalize(
        lie.quat_mul(s.q, lie.quat_exp(dxf[:, 3:6])))
    v = s.v + dxf[:, 6:9]
    ba = s.ba + dxf[:, 9:12]
    bg = s.bg + dxf[:, 12:15]
    e = ext_offset(w)
    tic = s.tic + dx[e:e + 3]
    qic = lie.quat_normalize(lie.quat_mul(s.qic, lie.quat_exp(dx[e + 3:e + 6])))
    td = s.td + dx[td_offset(w)]
    inv_depth = s.inv_depth if dl is None else s.inv_depth + dl
    return s._replace(p=p, q=q, v=v, ba=ba, bg=bg, tic=tic, qic=qic, td=td,
                      inv_depth=inv_depth)


def state_boxminus(s: WindowState, s0: WindowState) -> jnp.ndarray:
    """Packed local difference s ⊟ s0 of the pose-side parameters (D,).

    Used to relinearize the marginalization prior:
    r = r0 + J0 (x ⊟ x0)  (reference: marginalization_factor.cpp
    MarginalizationFactor::Evaluate)."""
    w = s.window
    dp = s.p - s0.p
    dth = lie.quat_boxminus(s.q, s0.q)
    dv = s.v - s0.v
    dba = s.ba - s0.ba
    dbg = s.bg - s0.bg
    frames = jnp.concatenate([dp, dth, dv, dba, dbg], axis=-1).reshape(-1)
    dext = jnp.concatenate([s.tic - s0.tic,
                            lie.quat_boxminus(s.qic, s0.qic)])
    return jnp.concatenate([frames, dext, (s.td - s0.td)[None]])


def gauge_fix(s: WindowState, p0_old: jnp.ndarray, q0_old: jnp.ndarray
              ) -> WindowState:
    """Re-anchor the window so frame 0 keeps its pre-optimization position
    and yaw (the 4 unobservable dofs), mirroring the reference's
    double2vector yaw correction (reference: estimator.cpp:960-1074)."""
    ypr_old = lie.mat_to_ypr(lie.quat_to_mat(q0_old))
    ypr_new = lie.mat_to_ypr(lie.quat_to_mat(s.q[0]))
    dyaw = ypr_old[0] - ypr_new[0]
    zero = jnp.zeros_like(dyaw)
    R = lie.ypr_to_mat(jnp.stack([dyaw, zero, zero]))
    q_rot = lie.mat_to_quat(R)
    p = (s.p - s.p[0:1]) @ R.T + p0_old
    q = lie.quat_normalize(lie.quat_mul(q_rot[None, :], s.q))
    v = s.v @ R.T
    return s._replace(p=p, q=q, v=v)
