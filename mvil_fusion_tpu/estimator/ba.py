"""Sliding-window bundle adjustment: batched assembly, Schur-complement
Levenberg-Marquardt, and marginalization.

This is the native replacement for the reference's Ceres DENSE_SCHUR+DOGLEG
solve (reference: vils_estimator/src/estimator.cpp optimization()
:1124-1687) and its Schur-complement marginalization prior (reference:
factor/marginalization_factor.cpp:251-301).

Structure exploited:
  * landmark inverse depths are scalars → H_ll is diagonal → the reduced
    camera system S = H_pp − H_pl H_ll⁻¹ H_plᵀ is a single dense (D,D)
    matrix (D = 15·W + 7 ≈ 112) solved by Cholesky on the MXU;
  * all factor Jacobians come from `factors.py` already stacked, so
    assembly is a handful of matmuls (no per-factor host loops, no
    4-pthread Hessian assembly as in the reference — one fused kernel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.estimator import factors as fac
from mvil_fusion_tpu.estimator import state as st
from mvil_fusion_tpu.ops import preintegration as pre
from mvil_fusion_tpu.utils.precision import full_precision


class Assembled(NamedTuple):
    H_pp: jnp.ndarray   # (D,D)
    H_pl: jnp.ndarray   # (D,F)
    H_ll: jnp.ndarray   # (F,)
    g_p: jnp.ndarray    # (D,)  = -Jᵀr
    g_l: jnp.ndarray    # (F,)
    cost: jnp.ndarray   # ()
    lam_free: jnp.ndarray  # (F,) bool — landmarks actually optimized


class BAProblem(NamedTuple):
    """Static-shape problem description consumed by `solve` (a pytree)."""

    feats: st.Features
    preints: pre.Preintegrated      # leading axis (W-1,)
    interval_mask: jnp.ndarray      # (W-1,) bool
    prior: fac.Prior
    gravity: jnp.ndarray            # (3,)
    anchor_ref: st.WindowState      # gauge anchor (used iff prior invalid)
    # extra dense linearized factors (lidar ICP / LPS / zero-velocity…):
    # r(x) = extra_r + extra_J (x ⊟ extra_x0)
    extra_J: jnp.ndarray            # (E, D)
    extra_r: jnp.ndarray            # (E,)
    extra_x0: st.WindowState
    # (D,) bool — True freezes that local dim (the reference's
    # SetParameterBlockConstant for extrinsics/td, estimator.cpp:1161-1169)
    fix_mask: jnp.ndarray


def empty_extra(w: int, e: int = 0, dtype=jnp.float32):
    D = st.pose_dim(w)
    return jnp.zeros((e, D), dtype), jnp.zeros((e,), dtype)


def make_fix_mask(w: int, fix_ext: bool = False, fix_td: bool = False):
    D = st.pose_dim(w)
    m = np.zeros(D, bool)
    if fix_ext:
        m[st.ext_offset(w):st.ext_offset(w) + 6] = True
    if fix_td:
        m[st.td_offset(w)] = True
    return jnp.asarray(m)


def _lam_free_mask(f: st.Features) -> jnp.ndarray:
    n_obs = jnp.sum(f.mask, axis=1)
    return f.valid & (~f.depth_fixed) & (n_obs >= 2)


@full_precision
def assemble(s: st.WindowState, prob: BAProblem, focal: float,
             anchor_weight: float = 1e3) -> Assembled:
    W = s.window
    F = s.num_features
    dtype = s.p.dtype

    vs = fac.vision_system(s, prob.feats, focal)
    imus = fac.imu_system(s, prob.preints, prob.interval_mask, prob.gravity)
    prs = fac.prior_system(prob.prior, s)
    anc = fac.anchor_system(s, prob.anchor_ref, anchor_weight,
                            jnp.logical_not(prob.prior.valid))

    extra_r = prob.extra_r + prob.extra_J @ st.state_boxminus(s, prob.extra_x0)
    Jd = jnp.concatenate([imus.J, prs.J, anc.J, prob.extra_J], axis=0)
    rd = jnp.concatenate([imus.r, prs.r, anc.r, extra_r], axis=0)

    H_pp = Jd.T @ Jd + jnp.einsum("nri,nrj->ij", vs.Jg, vs.Jg)
    g_p = -(Jd.T @ rd + jnp.einsum("nri,nr->i", vs.Jg, vs.r))

    Jg_f = vs.Jg.reshape(F, W, 2, -1)
    Jl_f = vs.Jl.reshape(F, W, 2)
    r_f = vs.r.reshape(F, W, 2)
    H_ll = jnp.einsum("fwr,fwr->f", Jl_f, Jl_f)
    H_pl = jnp.einsum("fwrd,fwr->df", Jg_f, Jl_f)
    g_l = -jnp.einsum("fwr,fwr->f", Jl_f, r_f)

    lam_free = _lam_free_mask(prob.feats)
    H_ll = jnp.where(lam_free, H_ll, 1.0)
    H_pl = jnp.where(lam_free[None, :], H_pl, 0.0)
    g_l = jnp.where(lam_free, g_l, 0.0)

    extra_cost = 0.5 * jnp.sum(extra_r * extra_r)
    cost = vs.cost + imus.cost + prs.cost + anc.cost + extra_cost
    return Assembled(H_pp, H_pl, H_ll, g_p, g_l, cost, lam_free)


@full_precision
def evaluate_cost(s: st.WindowState, prob: BAProblem, focal: float,
                  anchor_weight: float = 1e3) -> jnp.ndarray:
    """Residual-only total robust cost (XLA DCEs the unused jacobians when
    this is fused, but keeping an explicit light path aids clarity)."""
    vs = fac.vision_system(s, prob.feats, focal)
    imus = fac.imu_system(s, prob.preints, prob.interval_mask, prob.gravity)
    prs = fac.prior_system(prob.prior, s)
    anc = fac.anchor_system(s, prob.anchor_ref, anchor_weight,
                            jnp.logical_not(prob.prior.valid))
    extra_r = prob.extra_r + prob.extra_J @ st.state_boxminus(s, prob.extra_x0)
    extra_cost = 0.5 * jnp.sum(extra_r * extra_r)
    return vs.cost + imus.cost + prs.cost + anc.cost + extra_cost


class SolveResult(NamedTuple):
    state: st.WindowState
    cost0: jnp.ndarray
    cost1: jnp.ndarray
    n_accepted: jnp.ndarray


@full_precision
def solve(s0: st.WindowState, prob: BAProblem, focal: float,
          iters: int = 8, mu0: float = 1e-4,
          jitter: float = 1e-6) -> SolveResult:
    """Levenberg-Marquardt with landmark Schur complement.

    Fixed iteration count (static control flow for XLA); rejected steps are
    no-ops via `where`, damping adapts multiplicatively — the functional
    equivalent of the reference's ≤8-iteration DOGLEG budget
    (estimator.cpp:1400-1414).
    """
    D = st.pose_dim(s0.window)
    dtype = s0.p.dtype

    def step(carry, _):
        s, mu, cost_prev, n_acc = carry
        a = assemble(s, prob, focal)
        diag = jnp.diag(a.H_pp)
        Hd = a.H_pp + jnp.diag(mu * diag + jitter)
        Hll_d = a.H_ll * (1.0 + mu) + jitter
        inv_ll = 1.0 / Hll_d
        S = Hd - (a.H_pl * inv_ll[None, :]) @ a.H_pl.T
        rhs = a.g_p - a.H_pl @ (a.g_l * inv_ll)
        # frozen dims (extrinsics/td when not estimated — the reference's
        # SetParameterBlockConstant): identity row/col, zero rhs → δ = 0
        fm = prob.fix_mask
        S = jnp.where(fm[:, None] | fm[None, :], 0.0, S)
        S = S + jnp.diag(fm.astype(dtype))
        rhs = jnp.where(fm, 0.0, rhs)
        L, lower = jax.scipy.linalg.cho_factor(
            S + jitter * jnp.eye(D, dtype=dtype), lower=True)
        dx = jax.scipy.linalg.cho_solve((L, lower), rhs)
        dl = (a.g_l - a.H_pl.T @ dx) * inv_ll
        dl = jnp.where(a.lam_free, dl, 0.0)
        s_try = st.apply_delta(s, dx, dl)
        cost_try = evaluate_cost(s_try, prob, focal)
        ok = jnp.isfinite(cost_try) & (cost_try < a.cost)
        s_new = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), s_try, s)
        mu_new = jnp.where(ok, jnp.maximum(mu * 0.4, 1e-6),
                           jnp.minimum(mu * 6.0, 1e3))
        return (s_new, mu_new, a.cost, n_acc + ok.astype(jnp.int32)), a.cost

    init = (s0, jnp.asarray(mu0, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32))
    (s, mu, cost_last, n_acc), costs = jax.lax.scan(step, init, None,
                                                    length=iters)
    cost_final = evaluate_cost(s, prob, focal)
    return SolveResult(state=s, cost0=costs[0], cost1=cost_final,
                       n_accepted=n_acc)


# ---------------------------------------------------------------------------
# Marginalization
# ---------------------------------------------------------------------------

def _schur_drop_first(A: jnp.ndarray, b: jnp.ndarray, nd: int,
                      jitter: float = 1e-8):
    """Schur-eliminate the first nd dims of (A, b)."""
    Amm = A[:nd, :nd] + jitter * jnp.eye(nd, dtype=A.dtype)
    Amr = A[:nd, nd:]
    Arr = A[nd:, nd:]
    bm = b[:nd]
    br = b[nd:]
    # symmetric pseudo-solve via eigh (robust to rank deficiency, as the
    # reference does for Amm — marginalization_factor.cpp:274-290)
    w, V = jnp.linalg.eigh(Amm)
    w_inv = jnp.where(w > 1e-8 * jnp.max(jnp.abs(w)), 1.0 / w, 0.0)
    Amm_inv = (V * w_inv[None, :]) @ V.T
    A_new = Arr - Amr.T @ Amm_inv @ Amr
    b_new = br - Amr.T @ Amm_inv @ bm
    return A_new, b_new


def _sqrt_factor(A: jnp.ndarray, b: jnp.ndarray):
    """Eigen-decomposition square root: A = JᵀJ, r0 = J⁻ᵀ b
    (reference: marginalization_factor.cpp:292-301)."""
    w, V = jnp.linalg.eigh(A)
    thresh = 1e-8 * jnp.maximum(jnp.max(jnp.abs(w)), 1e-20)
    w_pos = jnp.where(w > thresh, w, 0.0)
    sqrt_w = jnp.sqrt(w_pos)
    inv_sqrt_w = jnp.where(w > thresh, 1.0 / jnp.maximum(sqrt_w, 1e-20), 0.0)
    J = sqrt_w[:, None] * V.T
    r0 = (inv_sqrt_w[:, None] * V.T) @ b
    return J, r0


@full_precision
def marginalize_old(s: st.WindowState, prob: BAProblem, focal: float
                    ) -> fac.Prior:
    """Marginalize frame 0 (15 dims) and all landmarks rooted there into a
    new linearized prior, then shift to the post-slide layout.

    Factor set mirrors the reference's slideWindow-old marginalization
    (estimator.cpp:1483-1620): previous prior + IMU factor of interval 0 +
    vision factors whose start frame is 0 + those LiDAR-ICP/LPS extras whose
    interpolation bracket touches frame 0 (the reference's NeedICPmarg /
    NeedLPSmarg handling, :1312-1317, :1345-1352).
    """
    W = s.window
    F = s.num_features
    D = st.pose_dim(W)
    dtype = s.p.dtype

    # vision factors restricted to features rooted at frame 0 (no robust
    # re-weighting subtleties: reuse the IRLS weight at the solution)
    feats = prob.feats
    rooted = feats.valid & (feats.start == 0)
    feats_r = feats._replace(valid=rooted)
    vs = fac.vision_system(s, feats_r, focal)
    imus = fac.imu_system(s, prob.preints,
                          jnp.arange(W - 1) == 0, prob.gravity)
    prs = fac.prior_system(prob.prior, s)

    # extras (linearized rows) that touch frame 0's local dims
    extra_r_now = (prob.extra_r
                   + prob.extra_J @ st.state_boxminus(s, prob.extra_x0))
    touches0 = jnp.any(jnp.abs(prob.extra_J[:, :15]) > 0, axis=1)
    eJ = prob.extra_J * touches0[:, None].astype(dtype)
    er = extra_r_now * touches0.astype(dtype)

    Jd = jnp.concatenate([imus.J, prs.J, eJ], axis=0)
    rd = jnp.concatenate([imus.r, prs.r, er], axis=0)
    A_pp = Jd.T @ Jd + jnp.einsum("nri,nrj->ij", vs.Jg, vs.Jg)
    b_p = -(Jd.T @ rd + jnp.einsum("nri,nr->i", vs.Jg, vs.r))

    Jg_f = vs.Jg.reshape(F, W, 2, D)
    Jl_f = vs.Jl.reshape(F, W, 2)
    r_f = vs.r.reshape(F, W, 2)
    A_ll = jnp.einsum("fwr,fwr->f", Jl_f, Jl_f)
    A_pl = jnp.einsum("fwrd,fwr->df", Jg_f, Jl_f)
    b_l = -jnp.einsum("fwr,fwr->f", Jl_f, r_f)

    # eliminate the dropped landmarks first (diagonal Schur); landmarks not
    # rooted at frame 0 have zero blocks here, so eliminating "all" is
    # eliminating exactly the rooted ones.
    drop_l = rooted & (~feats.depth_fixed)
    A_ll_safe = jnp.where(drop_l & (A_ll > 1e-12), A_ll, 1.0)
    sel = jnp.where(drop_l, 1.0, 0.0).astype(dtype)
    inv_ll = sel / A_ll_safe
    A_pp = A_pp - (A_pl * inv_ll[None, :]) @ A_pl.T
    b_p = b_p - A_pl @ (b_l * inv_ll)

    # eliminate frame 0 pose/speedbias dims (static slice 0:15)
    A_new, b_new = _schur_drop_first(A_pp, b_p, 15)
    J_r, r0_r = _sqrt_factor(A_new, b_new)   # (D-15, D-15)
    # prior residual convention: r(x) = r0 + J dx with b = -Jᵀ r0
    r0_r = -r0_r

    # shift to post-slide layout: old cols 15..D ↔ new cols 0..D-15 for
    # frames, ext/td stay at their (unchanged) offsets.
    nk = D - 15
    nf = 15 * (W - 1)           # frame part of the kept block
    J_new = jnp.zeros((D, D), dtype)
    J_new = J_new.at[:nk, 0:nf - 0].set(J_r[:, 0:nf])         # frames 1..W-1
    J_new = J_new.at[:nk, st.ext_offset(W):D].set(J_r[:, nf:])  # ext+td
    r0_new = jnp.zeros((D,), dtype).at[:nk].set(r0_r)

    x0 = shift_state(s)
    return fac.Prior(J=J_new, r0=r0_new, x0=x0, valid=jnp.ones((), bool))


@full_precision
def marginalize_second_new(s: st.WindowState, prob: BAProblem) -> fac.Prior:
    """Drop the second-newest frame's dims from the prior only
    (reference: MARGIN_SECOND_NEW path, estimator.cpp:1621-1683 — vision
    factors of that frame are discarded, IMU intervals are merged by the
    host window manager).

    The reference drops only the 6 pose dims and ASSERTS the prior has no
    columns on that frame's speed/bias (its sparse block bookkeeping
    guarantees it exactly).  Our eigh-based square root produces a dense
    prior whose speed/bias columns for frame W-2 are only *numerically*
    zero, so we Schur-eliminate the full 15 dims — identical in exact
    arithmetic, and it prevents residual v/ba/bg information of the
    discarded frame from being misattributed to the newest frame after
    `shift_state_second_new` overwrites slot W-2.
    """
    W = s.window
    D = st.pose_dim(W)
    dtype = s.p.dtype
    prs = fac.prior_system(prob.prior, s)
    A = prs.J.T @ prs.J
    b = -prs.J.T @ prs.r
    k = W - 2
    lo, hi = 15 * k, 15 * k + 15
    idx_drop = jnp.arange(lo, hi)
    idx_keep = jnp.concatenate([jnp.arange(0, lo), jnp.arange(hi, D)])
    perm = jnp.concatenate([idx_drop, idx_keep])
    A_p = A[jnp.ix_(perm, perm)]
    b_p = b[perm]
    A_new, b_new = _schur_drop_first(A_p, b_p, 15)
    J_r, r0_r = _sqrt_factor(A_new, b_new)
    r0_r = -r0_r
    nk = D - 15
    J_new = jnp.zeros((D, D), dtype).at[:nk, idx_keep].set(J_r)
    r0_new = jnp.zeros((D,), dtype).at[:nk].set(r0_r)
    x0 = shift_state_second_new(s)
    return fac.Prior(J=J_new, r0=r0_new, x0=x0, valid=jnp.ones((), bool))


def shift_state(s: st.WindowState) -> st.WindowState:
    """Window shift after marginalize-old: frame k+1 → k, last slot
    duplicated (host overwrites it with the incoming frame)."""
    def sh(x):
        return jnp.concatenate([x[1:], x[-1:]], axis=0)
    return s._replace(p=sh(s.p), q=sh(s.q), v=sh(s.v), ba=sh(s.ba),
                      bg=sh(s.bg))


def shift_state_second_new(s: st.WindowState) -> st.WindowState:
    """After marginalize-second-new: newest frame (W-1) moves to slot W-2."""
    W = s.window

    def sh(x):
        return x.at[W - 2].set(x[W - 1])
    return s._replace(p=sh(s.p), q=sh(s.q), v=sh(s.v), ba=sh(s.ba),
                      bg=sh(s.bg))
