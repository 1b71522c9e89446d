"""Visual-inertial initialization.

Re-implements the reference's initialization stack:

* camera-IMU rotation hand-eye calibration
  (reference: vils_estimator/src/initial/initial_ex_rotation.cpp:24-113)
* relative pose by essential matrix (reference: initial/solve_5pts.cpp:193-230
  — we use a batched 8-point essential RANSAC, same geometry, batch-parallel)
* global SfM: two-view triangulation chain + PnP + full BA
  (reference: initial/initial_sfm.cpp:21-309)
* gyro bias + linear alignment (legacy VINS path kept by the reference,
  initial/initial_aligment.cpp:10-219)
* the reference's NOVEL bounded two-stage VI init: per-interval gyro bias +
  RIC + per-frame td from rotation consistency, then per-frame velocity +
  per-frame scale + acc bias + pbc + gravity direction
  (reference: initial_aligment.cpp:221-484, constraints
  initial/initial_alignment.h:36-233) — solved here with projected-LM
  (ops/lm.py) instead of bounded Ceres.

Frame conventions follow the reference: SfM gives camera poses
(R_c0_ci, p_c0_ci) in the reference-camera frame c0; stage A converts frame
rotations to body (R_c0_bi = R_c0_ci · RICᵀ); velocities in stage B live in
each body frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.ops import lm, preintegration as pre, triangulate as tri
from mvil_fusion_tpu.ops.ransac import _eight_point
from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


# ---------------------------------------------------------------------------
# Hand-eye rotation calibration (ESTIMATE_EXTRINSIC == 2 path)
# ---------------------------------------------------------------------------

@full_precision
def hand_eye_rotation(q_b: jnp.ndarray, q_c: jnp.ndarray,
                      weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Solve q_bc from paired relative rotations: q_b ⊗ q_bc = q_bc ⊗ q_c.

    q_b, q_c: (N,4) body / camera relative rotations of the same intervals.
    Stacks N 4x4 (L(q_b) − R(q_c)) blocks and takes the smallest right
    singular vector — the same construction as the reference's
    CalibrationExRotation (initial_ex_rotation.cpp:24-113).
    """
    def lmat(q):
        w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        return jnp.stack([
            jnp.stack([w, -x, -y, -z], -1),
            jnp.stack([x, w, -z, y], -1),
            jnp.stack([y, z, w, -x], -1),
            jnp.stack([z, -y, x, w], -1),
        ], -2)

    def rmat(q):
        w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        return jnp.stack([
            jnp.stack([w, -x, -y, -z], -1),
            jnp.stack([x, w, z, -y], -1),
            jnp.stack([y, -z, w, x], -1),
            jnp.stack([z, y, -x, w], -1),
        ], -2)

    A = lmat(q_b) - rmat(q_c)                       # (N,4,4)
    if weights is not None:
        A = A * weights[:, None, None]
    A = A.reshape(-1, 4)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    q = Vt[-1]
    return lie.quat_canonical(lie.quat_normalize(q))


# ---------------------------------------------------------------------------
# Essential-matrix relative pose (the reference's 5-pt role)
# ---------------------------------------------------------------------------

class RelPose(NamedTuple):
    R: jnp.ndarray        # (3,3) such that x_l ~ R x_c + t (c → l)
    t: jnp.ndarray        # (3,) unit norm
    inliers: jnp.ndarray  # (N,)
    ok: jnp.ndarray


@full_precision
def essential_relative_pose(key, x_l: jnp.ndarray, x_c: jnp.ndarray,
                            valid: jnp.ndarray, n_hyp: int = 256,
                            thr: float = 0.3 / 460.0) -> RelPose:
    """Relative pose from normalized correspondences (reference
    solveRelativeRT semantics: returns R,t mapping current-frame points into
    the l frame).  Batched 8-point essential + cheirality vote."""
    n = x_l.shape[0]
    dtype = x_l.dtype
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, n, shape=(n_hyp, 8), replace=True, p=p)
    Es = jax.vmap(lambda i: _eight_point(x_l[i], x_c[i]))(idx)

    def sampson(E):
        x1h = jnp.concatenate([x_l, jnp.ones_like(x_l[:, :1])], -1)
        x2h = jnp.concatenate([x_c, jnp.ones_like(x_c[:, :1])], -1)
        Ex1 = x1h @ E.T
        Etx2 = x2h @ E
        num = jnp.sum(x2h * Ex1, -1) ** 2
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
        return num / jnp.maximum(den, 1e-15)

    d = jax.vmap(sampson)(Es)
    inl = (d < thr * thr) & valid[None, :]
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)
    E = Es[best]
    inliers = inl[best]

    # decompose E (x2ᵀ E x1 = 0 with x1 in l, x2 in c ⇒ E = [t]x R maps l→c)
    U, S, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    Wm = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                   dtype)
    R1 = U @ Wm @ Vt
    R2 = U @ Wm.T @ Vt
    tt = U[:, 2]
    cands = [(R1, tt), (R1, -tt), (R2, tt), (R2, -tt)]

    def cheirality(Rc, tc):
        # triangulate midpoint-style for all correspondences under (Rc, tc)
        # where x_c ~ Rc x_l + tc; count points with positive depth in both.
        x1h = jnp.concatenate([x_l, jnp.ones_like(x_l[:, :1])], -1)
        x2h = jnp.concatenate([x_c, jnp.ones_like(x_c[:, :1])], -1)
        # linear triangulation: rows from P1=[I|0], P2=[Rc|tc]
        P2 = jnp.concatenate([Rc, tc[:, None]], axis=1)

        def tri_one(a, b):
            A = jnp.stack([
                a[0] * jnp.array([0, 0, 1, 0.0], dtype) - jnp.array(
                    [1, 0, 0, 0.0], dtype),
                a[1] * jnp.array([0, 0, 1, 0.0], dtype) - jnp.array(
                    [0, 1, 0, 0.0], dtype),
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ])
            _, V = jnp.linalg.eigh(A.T @ A)
            X = V[:, 0]
            w = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
            p1 = X[:3] / w
            z1 = p1[2]
            z2 = (Rc @ p1 + tc)[2]
            return (z1 > 0) & (z2 > 0)

        okz = jax.vmap(tri_one)(x1h, x2h)
        return jnp.sum(okz & inliers)

    votes = jnp.stack([cheirality(Rc, tc) for Rc, tc in cands])
    ibest = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R_lc = Rs[ibest]
    t_lc = ts[ibest]
    # (R_lc, t_lc) map l→c; invert to map current→l as the reference returns
    R = R_lc.T
    t = -R_lc.T @ t_lc
    ok = counts[best] >= 12
    return RelPose(R=R, t=t, inliers=inliers, ok=ok)


# ---------------------------------------------------------------------------
# PnP (DLT + LM refine) — used by the SfM chain
# ---------------------------------------------------------------------------

@full_precision
def pnp(pts3d: jnp.ndarray, obs: jnp.ndarray, mask: jnp.ndarray,
        p0: jnp.ndarray, q0: jnp.ndarray, iters: int = 10):
    """Camera pose (world→cam R, t as T_c_w) refinement from 3-D points and
    normalized observations, starting at (p0, q0) = T_w_c guess.

    Returns (p_wc, q_wc, ok)."""
    dtype = pts3d.dtype
    m = mask.astype(dtype)

    def residual(x):
        p = x[:3]
        q = lie.quat_boxplus(q0, x[3:6])
        pc = lie.quat_rotate_inv(q, pts3d - p)
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-6, 1e-6, pc[:, 2])
        r = (pc[:, :2] / z[:, None] - obs) * m[:, None]
        # penalize negative depth to keep the solution in front
        pen = jnp.maximum(-pc[:, 2], 0.0) * m
        return jnp.concatenate([r.reshape(-1), pen])

    x0 = jnp.concatenate([p0, jnp.zeros(3, dtype)])
    res = lm.lm_solve(residual, x0, iters=iters)
    p = res.x[:3]
    q = lie.quat_boxplus(q0, res.x[3:6])
    n_used = jnp.sum(mask)
    ok = (n_used >= 6) & (res.cost < 0.01 * jnp.maximum(n_used, 1))
    return p, q, ok


# ---------------------------------------------------------------------------
# Global SfM (reference GlobalSFM::construct)
# ---------------------------------------------------------------------------

class SfmResult(NamedTuple):
    ok: bool
    p_c0_c: np.ndarray     # (W,3) camera positions in c0 (unscaled)
    q_c0_c: np.ndarray     # (W,4) camera rotations
    pts: np.ndarray        # (F,3) world points in c0
    pts_ok: np.ndarray     # (F,)


def global_sfm(obs: np.ndarray, mask: np.ndarray, l: int,
               R_lc: np.ndarray, t_lc: np.ndarray) -> SfmResult:
    """Host-orchestrated SfM over the window.

    obs (F,W,2) normalized observations, mask (F,W); l = reference frame;
    (R_lc, t_lc) = pose of the newest frame (index W-1) in frame l.
    Mirrors initial_sfm.cpp:116-309: triangulate l↔newest, PnP the frames
    between, then the frames before l, triangulate everything, full BA.
    """
    F, W, _ = obs.shape
    p = np.zeros((W, 3), np.float32)
    q = np.tile(np.array([1, 0, 0, 0], np.float32), (W, 1))
    p[W - 1] = t_lc
    q[W - 1] = np.asarray(lie.mat_to_quat(jnp.asarray(R_lc)))

    pts = np.zeros((F, 3), np.float32)
    pts_ok = np.zeros(F, bool)

    def tri_pair(i, j):
        """Triangulate features seen in frames i and j with known poses."""
        sel = mask[:, i] & mask[:, j] & ~pts_ok
        if not sel.any():
            return
        obs2 = np.zeros((F, W, 2), np.float32)
        m2 = np.zeros((F, W), bool)
        obs2[:, i] = obs[:, i]
        obs2[:, j] = obs[:, j]
        m2[:, i] = sel
        m2[:, j] = sel
        inv_d, good = tri.triangulate_window(
            jnp.asarray(p), jnp.asarray(q), jnp.asarray(obs2),
            jnp.asarray(m2), jnp.zeros(F, jnp.int32) + i)
        good = np.asarray(good) & sel
        # world point from start-frame depth
        d = 1.0 / np.maximum(np.asarray(inv_d), 1e-6)
        R_i = np.asarray(lie.quat_to_mat(jnp.asarray(q[i])))
        xyw = np.concatenate([obs[:, i], np.ones((F, 1), np.float32)], -1)
        pw = (xyw * d[:, None]) @ R_i.T + p[i]
        pts[good] = pw[good]
        pts_ok[good] = True

    def do_pnp(i, guess_from):
        sel = mask[:, i] & pts_ok
        if sel.sum() < 6:
            return False
        pp, qq, ok = pnp(jnp.asarray(pts), jnp.asarray(obs[:, i]),
                         jnp.asarray(sel), jnp.asarray(p[guess_from]),
                         jnp.asarray(q[guess_from]))
        if not bool(ok):
            return False
        p[i] = np.asarray(pp)
        q[i] = np.asarray(qq)
        return True

    tri_pair(l, W - 1)
    # frames l+1 .. W-2: PnP from existing points, then triangulate with W-1
    for i in range(l + 1, W - 1):
        if not do_pnp(i, i - 1 if i > l else l):
            return SfmResult(False, p, q, pts, pts_ok)
        tri_pair(i, W - 1)
    # triangulate l..i for more points
    for i in range(l + 1, W - 1):
        tri_pair(l, i)
    # frames l-1 .. 0: PnP + triangulate with l
    for i in range(l - 1, -1, -1):
        if not do_pnp(i, i + 1):
            return SfmResult(False, p, q, pts, pts_ok)
        tri_pair(i, l)
    # triangulate all remaining features with ≥2 observing frames
    inv_d, good = tri.triangulate_window(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(obs),
        jnp.asarray(mask & ~pts_ok[:, None]),
        jnp.asarray(np.argmax(mask, axis=1).astype(np.int32)))
    good = np.asarray(good) & ~pts_ok & (mask.sum(1) >= 2)
    start = np.argmax(mask, axis=1)
    d = 1.0 / np.maximum(np.asarray(inv_d), 1e-6)
    for f in np.nonzero(good)[0]:
        i = start[f]
        R_i = np.asarray(lie.quat_to_mat(jnp.asarray(q[i])))
        xyw = np.concatenate([obs[f, i], [1.0]]).astype(np.float32)
        pts[f] = R_i @ (xyw * d[f]) + p[i]
        pts_ok[f] = True

    if pts_ok.sum() < 15:
        return SfmResult(False, p, q, pts, pts_ok)

    # full BA: optimize all poses (l's rotation fixed; l and W-1 translations
    # fixed, reference initial_sfm.cpp:231+) + points
    p_j, q_j, pts_j = _sfm_ba(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(pts), jnp.asarray(pts_ok),
                              jnp.asarray(obs), jnp.asarray(mask), l)
    return SfmResult(True, np.asarray(p_j), np.asarray(q_j),
                     np.asarray(pts_j), pts_ok)


@full_precision
def _sfm_ba(p, q, pts, pts_ok, obs, mask, l, iters: int = 15):
    W = p.shape[0]
    F = pts.shape[0]
    dtype = p.dtype
    free_t = jnp.ones((W,), bool).at[l].set(False).at[W - 1].set(False)

    def unpack(x):
        dp = x[: 3 * W].reshape(W, 3) * free_t[:, None]
        dth = x[3 * W:6 * W].reshape(W, 3)
        dth = dth.at[l].set(0.0)
        dpt = x[6 * W:].reshape(F, 3)
        return (p + dp, jax.vmap(lie.quat_boxplus)(q, dth), pts + dpt)

    m = (mask & pts_ok[:, None]).astype(dtype)

    def residual(x):
        pp, qq, ppts = unpack(x)
        # all (f, w) reprojections
        pc = jax.vmap(
            lambda pw, qw: lie.quat_rotate_inv(qw, ppts - pw))(pp, qq)
        # pc: (W,F,3)
        z = jnp.where(jnp.abs(pc[..., 2]) < 1e-6, 1e-6, pc[..., 2])
        proj = pc[..., :2] / z[..., None]
        r = (proj - jnp.swapaxes(obs, 0, 1)) * jnp.swapaxes(m, 0, 1)[..., None]
        return r.reshape(-1)

    x0 = jnp.zeros((6 * W + 3 * F,), dtype)
    res = lm.lm_solve(residual, x0, iters=iters)
    return unpack(res.x)


# ---------------------------------------------------------------------------
# Gyro bias (legacy linear path, reference initial_aligment.cpp:10-50)
# ---------------------------------------------------------------------------

@full_precision
def solve_gyroscope_bias(q_c0_b: jnp.ndarray, preints: pre.Preintegrated,
                         interval_mask: jnp.ndarray) -> jnp.ndarray:
    """Linear LS for a single gyro bias from SfM body rotations."""
    W = q_c0_b.shape[0]
    q_ij = jax.vmap(lambda i: lie.quat_mul(lie.quat_conj(q_c0_b[i]),
                                           q_c0_b[i + 1]))(jnp.arange(W - 1))
    J = preints.J[:, 3:6, 12:15]                     # (W-1,3,3) dq/dbg
    r = jax.vmap(lambda k: 2.0 * lie.quat_mul(
        lie.quat_conj(preints.dq[k]), q_ij[k])[1:4])(jnp.arange(W - 1))
    m = interval_mask.astype(q_c0_b.dtype)[:, None]
    A = (J * m[..., None]).reshape(-1, 3)
    b = (r * m).reshape(-1)
    return jnp.linalg.lstsq(A, b)[0]


# ---------------------------------------------------------------------------
# Legacy linear alignment (reference initial_aligment.cpp:147-219, the VINS
# path kept by the reference as fallback) — single global scale, per-frame
# velocity, gravity; overdetermined linear system, production init path.
# ---------------------------------------------------------------------------

class LinearAlign(NamedTuple):
    ok: bool
    vel: jnp.ndarray      # (W,3) body-frame velocities
    g_c0: jnp.ndarray     # gravity in c0
    scale: jnp.ndarray    # () global scale
    cost: float
    scale_sigma: float = float("inf")   # 1-sigma scale uncertainty from
    #                                     the normal matrix (observability)


@full_precision
def linear_alignment(p_c0_c: jnp.ndarray, q_c0_b: jnp.ndarray,
                     preints: pre.Preintegrated, g_norm: float,
                     pbc: jnp.ndarray) -> LinearAlign:
    """Solve [v_0..v_{W-1} (body), g_c0, s] from preintegrated deltas and
    unscaled SfM camera positions.  Linear LS, then fixed-norm gravity
    refinement (RefineGravity of the reference)."""
    W = p_c0_c.shape[0]
    nI = W - 1
    dtype = p_c0_c.dtype
    R = lie.quat_to_mat(q_c0_b)                      # R_c0_bi
    n_state = 3 * W + 3 + 1

    rows = []
    rhs = []
    for k in range(nI):
        dt = preints.sum_dt[k]
        Rbi = R[k].T                                  # c0 → body_i
        A = jnp.zeros((6, n_state), dtype)
        b = jnp.zeros((6,), dtype)
        # position rows: dp = Rbi( s·(p_{k+1}−p_k) − 0.5 g dt² ) − v_k dt
        #                + (Rbi R_{k+1} − I) pbc
        A = A.at[0:3, 3 * k:3 * k + 3].set(-dt * jnp.eye(3, dtype=dtype))
        A = A.at[0:3, 3 * W:3 * W + 3].set(0.5 * Rbi * dt * dt)
        A = A.at[0:3, 3 * W + 3].set(Rbi @ (p_c0_c[k + 1] - p_c0_c[k]))
        b = b.at[0:3].set(preints.dp[k]
                          - pbc + Rbi @ R[k + 1] @ pbc)
        # velocity rows: dv = Rbi( R_{k+1} v_{k+1} − R_k v_k − g dt )
        A = A.at[3:6, 3 * k:3 * k + 3].set(-jnp.eye(3, dtype=dtype))
        A = A.at[3:6, 3 * (k + 1):3 * (k + 1) + 3].set(Rbi @ R[k + 1])
        A = A.at[3:6, 3 * W:3 * W + 3].set(Rbi * dt)
        b = b.at[3:6].set(preints.dv[k])
        rows.append(A)
        rhs.append(b)
    A = jnp.concatenate(rows, axis=0)
    b = jnp.concatenate(rhs, axis=0)
    x = jnp.linalg.lstsq(A, b)[0]
    g0 = x[3 * W:3 * W + 3]
    s = x[3 * W + 3]

    # refine gravity on the fixed-norm manifold: g = g_norm·ĝ + w1 b1 + w2 b2
    def tangent_basis(g):
        a = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
        tmp = jnp.where(jnp.abs(a[2]) > 0.9,
                        jnp.array([1.0, 0.0, 0.0], dtype),
                        jnp.array([0.0, 0.0, 1.0], dtype))
        b1 = tmp - a * jnp.dot(a, tmp)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-9)
        b2 = jnp.cross(a, b1)
        return b1, b2

    g = g0
    for _ in range(4):
        b1, b2 = tangent_basis(g)
        ghat = g / jnp.maximum(jnp.linalg.norm(g), 1e-9) * g_norm
        # substitute g = ghat + w1 b1 + w2 b2 into the same system
        n2 = 3 * W + 2 + 1
        rows2, rhs2 = [], []
        for k in range(nI):
            dt = preints.sum_dt[k]
            Rbi = R[k].T
            A2 = jnp.zeros((6, n2), dtype)
            c2 = jnp.zeros((6,), dtype)
            A2 = A2.at[0:3, 3 * k:3 * k + 3].set(-dt * jnp.eye(3, dtype=dtype))
            A2 = A2.at[0:3, 3 * W].set(0.5 * dt * dt * (Rbi @ b1))
            A2 = A2.at[0:3, 3 * W + 1].set(0.5 * dt * dt * (Rbi @ b2))
            A2 = A2.at[0:3, 3 * W + 2].set(Rbi @ (p_c0_c[k + 1] - p_c0_c[k]))
            c2 = c2.at[0:3].set(preints.dp[k] - pbc + Rbi @ R[k + 1] @ pbc
                                - 0.5 * dt * dt * (Rbi @ ghat))
            A2 = A2.at[3:6, 3 * k:3 * k + 3].set(-jnp.eye(3, dtype=dtype))
            A2 = A2.at[3:6, 3 * (k + 1):3 * (k + 1) + 3].set(Rbi @ R[k + 1])
            A2 = A2.at[3:6, 3 * W].set(dt * (Rbi @ b1))
            A2 = A2.at[3:6, 3 * W + 1].set(dt * (Rbi @ b2))
            c2 = c2.at[3:6].set(preints.dv[k] - dt * (Rbi @ ghat))
            rows2.append(A2)
            rhs2.append(c2)
        A2 = jnp.concatenate(rows2, axis=0)
        c2 = jnp.concatenate(rhs2, axis=0)
        x2 = jnp.linalg.lstsq(A2, c2)[0]
        g = ghat + x2[3 * W] * b1 + x2[3 * W + 1] * b2
        s = x2[3 * W + 2]
        vel = x2[:3 * W].reshape(W, 3)

    resid = A2 @ x2 - c2
    cost = float(0.5 * jnp.sum(resid * resid))
    g_final = g / jnp.maximum(jnp.linalg.norm(g), 1e-9) * g_norm
    ok = bool(s > 0.0) and np.isfinite(cost)
    # scale observability: 1-sigma of s from the normal matrix.  Short or
    # weakly-excited windows leave a near-null direction mixing (s, g, v)
    # — the fit then looks perfect (tiny cost) at a scale tens of percent
    # off (measured: s=0.059 and the true 0.088 both fit one 0.65 s
    # fixture window to the same residual), which seeds the filter with a
    # wrong metric scale and forces a long, bias-absorbing correction
    # transient.  Callers gate initialization on scale_sigma/scale.
    m, n2_ = A2.shape
    dof = max(m - n2_, 1)
    sigma2 = 2.0 * cost / dof
    try:
        N = np.asarray(A2.T @ A2, np.float64)
        cov_ss = float(np.linalg.inv(N)[-1, -1])
        scale_sigma = float(np.sqrt(max(sigma2 * cov_ss, 0.0)))
    except np.linalg.LinAlgError:
        scale_sigma = float("inf")
    return LinearAlign(ok=ok, vel=vel, g_c0=g_final, scale=s, cost=cost,
                       scale_sigma=scale_sigma)


# ---------------------------------------------------------------------------
# Novel bounded two-stage alignment (reference initial_aligment.cpp:221-484)
# ---------------------------------------------------------------------------

class StageA(NamedTuple):
    ok: bool
    q_ric: jnp.ndarray     # refined camera→IMU rotation
    bgs: jnp.ndarray       # (W-1,3) per-interval gyro bias
    td: jnp.ndarray        # (W,) per-frame time offset
    cost: float


def estimate_ric_td_bg(q_c0_c: jnp.ndarray, preints: pre.Preintegrated,
                       gyr_first: jnp.ndarray, gyr_last: jnp.ndarray,
                       q_ric0: jnp.ndarray, fix_ric: bool = False,
                       cost_gate: float = 1e-5,
                       reg: float = 1e-3) -> StageA:
    """Stage A: rotation-consistency solve for (RIC, per-interval bg,
    per-frame td), all bounded — reference Estimate_ric_td_bg.

    gyr_first/gyr_last: (W-1,3) first/last raw gyro sample of each interval
    (the reference's gyr_0 / gyr_1 of frame_j's preintegration).
    """
    W = q_c0_c.shape[0]
    nI = W - 1
    dtype = q_c0_c.dtype
    Jbg = preints.J[:, 3:6, 12:15]

    def residual(x):
        dric = x[0:3] * (0.0 if fix_ric else 1.0)
        bgs = x[3:3 + 3 * nI].reshape(nI, 3)
        td = x[3 + 3 * nI:3 + 3 * nI + W]
        q_ric = lie.quat_boxplus(q_ric0, dric)

        def per_interval(k):
            wj = gyr_last[k]
            wi = gyr_first[k]
            Ql = jnp.concatenate([jnp.ones((1,), dtype),
                                  -0.5 * wj * td[k + 1]])
            Qr = jnp.concatenate([jnp.ones((1,), dtype),
                                  0.5 * wi * td[k]])
            qcj_c0 = lie.quat_conj(q_c0_c[k + 1])
            qc0_ci = q_c0_c[k]
            qjbg = jnp.concatenate([jnp.ones((1,), dtype),
                                    0.5 * (Jbg[k] @ bgs[k])])
            # Ql ⊗ Qbc ⊗ qcjc0 ⊗ qc0ci ⊗ Qcb ⊗ Qr ⊗ qbibj ⊗ qjbg
            out = lie.quat_mul(Ql, q_ric)
            out = lie.quat_mul(out, qcj_c0)
            out = lie.quat_mul(out, qc0_ci)
            out = lie.quat_mul(out, lie.quat_conj(q_ric))
            out = lie.quat_mul(out, Qr)
            out = lie.quat_mul(out, preints.dq[k])
            out = lie.quat_mul(out, qjbg)
            return 2.0 * out[1:4]

        data = jax.vmap(per_interval)(jnp.arange(nI)).reshape(-1)
        # Weak min-norm regularizer on (bgs, td): the rotation-consistency
        # system is underdetermined per interval (the reference relies on
        # Ceres' path behavior inside the same flat family); this picks the
        # smallest-parameter member so the translation stage sees camera
        # rotations consistent with the *nominal* frame timestamps.
        return jnp.concatenate([data, reg * x[3:]])

    n = 3 + 3 * nI + W
    lower = jnp.full((n,), -jnp.inf, dtype)
    upper = jnp.full((n,), jnp.inf, dtype)
    lower = lower.at[3:3 + 3 * nI].set(-0.1).at[3 + 3 * nI:].set(-0.1)
    upper = upper.at[3:3 + 3 * nI].set(0.1).at[3 + 3 * nI:].set(0.1)
    res = lm.lm_solve(residual, jnp.zeros((n,), dtype), iters=30,
                      lower=lower, upper=upper)
    x = res.x
    q_ric = lie.quat_boxplus(q_ric0, x[0:3] * (0.0 if fix_ric else 1.0))
    cost = float(res.cost)
    return StageA(ok=cost < cost_gate * max(nI, 1) * 50, q_ric=q_ric,
                  bgs=x[3:3 + 3 * nI].reshape(nI, 3),
                  td=x[3 + 3 * nI:3 + 3 * nI + W], cost=cost)


class StageB(NamedTuple):
    ok: bool
    vel: jnp.ndarray       # (W,3) body-frame velocities
    scale: jnp.ndarray     # (W,) per-frame scale
    g_c0: jnp.ndarray      # gravity in c0
    pbc: jnp.ndarray       # camera-IMU translation
    bas: jnp.ndarray       # (W-1,3) per-interval acc bias
    cost: float


def estimate_vel_g_s_tic(p_c0_c: jnp.ndarray, q_c0_b: jnp.ndarray,
                         preints: pre.Preintegrated, g_norm: float,
                         pbc0: jnp.ndarray,
                         pbc_lower: jnp.ndarray, pbc_upper: jnp.ndarray,
                         fix_pbc: bool = False,
                         cost_gate: float = 5e-4,
                         vel0: jnp.ndarray | None = None,
                         g0: jnp.ndarray | None = None,
                         scale0: jnp.ndarray | float | None = None
                         ) -> StageB:
    """Stage B: per-frame velocity/scale + acc bias + pbc + gravity
    direction — reference Estimate_vel_g_s_tic (bounded projected LM).

    The per-frame-scale system is underdetermined (the bounds + damping
    regularize it), so convergence depends on the seed: pass (vel0, g0,
    scale0) from the linear alignment to start in the consistent basin —
    the solve then refines per-frame scale, acc bias and pbc around it."""
    W = p_c0_c.shape[0]
    nI = W - 1
    dtype = p_c0_c.dtype
    R_c0_b = lie.quat_to_mat(q_c0_b)                  # (W,3,3)
    Jp = preints.J[:, 0:3, 9:12]
    Jv = preints.J[:, 6:9, 9:12]

    # layout: vel (3W), pbc (3), gdir (3), s (W), bas (3(W-1))
    ofs_v, ofs_p, ofs_g, ofs_s, ofs_a = 0, 3 * W, 3 * W + 3, 3 * W + 6, 4 * W + 6
    n = 4 * W + 6 + 3 * nI

    def residual(x):
        vel = x[ofs_v:ofs_v + 3 * W].reshape(W, 3)
        pbc = pbc0 if fix_pbc else x[ofs_p:ofs_p + 3]
        gdir = x[ofs_g:ofs_g + 3]
        s = x[ofs_s:ofs_s + W]
        bas = x[ofs_a:].reshape(nI, 3)
        # fixed-norm gravity (the reference fixes ‖G‖ and solves only the
        # direction): normalize inside the residual so the magnitude can
        # never soak up scale error (the radial direction is a gauge
        # null-space, handled by LM damping)
        Gc0 = g_norm * gdir / jnp.maximum(jnp.linalg.norm(gdir), 1e-6)

        def per_interval(k):
            dt = preints.sum_dt[k]
            Rbic0 = R_c0_b[k].T
            Rc0bj = R_c0_b[k + 1]
            dp = preints.dp[k] + Jp[k] @ bas[k]
            dv = preints.dv[k] + Jv[k] @ bas[k]
            r_p = (dp - pbc + Rbic0 @ Rc0bj @ pbc
                   - Rbic0 @ (s[k + 1] * p_c0_c[k + 1] - s[k] * p_c0_c[k])
                   + vel[k] * dt - 0.5 * Rbic0 @ Gc0 * dt * dt)
            r_v = dv - Rbic0 @ (Rc0bj @ vel[k + 1] - R_c0_b[k] @ vel[k]
                                + Gc0 * dt)
            return jnp.concatenate([r_p, r_v])

        return jax.vmap(per_interval)(jnp.arange(nI)).reshape(-1)

    lower = jnp.full((n,), -jnp.inf, dtype)
    upper = jnp.full((n,), jnp.inf, dtype)
    lower = lower.at[ofs_s:ofs_s + W].set(0.0)
    lower = lower.at[ofs_a:].set(-0.2)
    upper = upper.at[ofs_a:].set(0.2)
    if not fix_pbc:
        lower = lower.at[ofs_p:ofs_p + 3].set(pbc_lower)
        upper = upper.at[ofs_p:ofs_p + 3].set(pbc_upper)

    x0 = jnp.zeros((n,), dtype)
    if not fix_pbc:
        x0 = x0.at[ofs_p:ofs_p + 3].set(pbc0)
    if g0 is not None:
        g_guess = jnp.asarray(g0, dtype)
        g_guess = g_guess / jnp.maximum(jnp.linalg.norm(g_guess), 1e-9)
    else:
        # gravity direction init: down-ish in c0 — use the dv of the first
        # interval (dominated by gravity for slow motion)
        g_guess = preints.dv[0] / jnp.maximum(
            jnp.linalg.norm(preints.dv[0]), 1e-6)
        g_guess = R_c0_b[0] @ g_guess
    x0 = x0.at[ofs_g:ofs_g + 3].set(g_guess)
    s_init = 1.0 if scale0 is None else scale0
    x0 = x0.at[ofs_s:ofs_s + W].set(
        jnp.broadcast_to(jnp.asarray(s_init, dtype), (W,)))
    if vel0 is not None:
        x0 = x0.at[ofs_v:ofs_v + 3 * W].set(
            jnp.asarray(vel0, dtype).reshape(-1))
    else:
        # analytic velocity seed from the scaled camera positions (finite
        # difference in c0, rotated to body) — a zero seed with a nonzero
        # scale seed starts LM outside the true basin
        dp_c0 = jnp.diff(p_c0_c, axis=0) * jnp.asarray(s_init, dtype)
        v_c0 = dp_c0 / jnp.maximum(preints.sum_dt[:, None], 1e-6)
        v_c0 = jnp.concatenate([v_c0, v_c0[-1:]], axis=0)      # (W,3)
        v_body = jnp.einsum("wij,wj->wi",
                            jnp.swapaxes(R_c0_b, -1, -2), v_c0)
        x0 = x0.at[ofs_v:ofs_v + 3 * W].set(v_body.reshape(-1))

    res = lm.lm_solve(residual, x0, iters=60, lower=lower, upper=upper)
    x = res.x
    gdir = x[ofs_g:ofs_g + 3]
    g_c0 = g_norm * gdir / jnp.maximum(jnp.linalg.norm(gdir), 1e-9)
    cost = float(res.cost)
    return StageB(ok=cost < cost_gate, vel=x[:3 * W].reshape(W, 3),
                  scale=x[ofs_s:ofs_s + W],
                  g_c0=g_c0,
                  pbc=(pbc0 if fix_pbc else x[ofs_p:ofs_p + 3]),
                  bas=x[ofs_a:].reshape(nI, 3), cost=cost)
