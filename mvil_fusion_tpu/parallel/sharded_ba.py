"""Feature-sharded distributed bundle adjustment.

The reference runs its whole window BA in one Ceres solve on one CPU
(reference: vils_estimator/src/estimator.cpp:1124-1687).  Here the landmark
axis — the large, embarrassingly parallel axis of the reduced camera system —
is sharded across a device mesh:

  * each device holds a shard of the feature table and its inverse depths;
  * each device assembles its partial reduced system
    (H_pp^dev = Σ_f∈shard J_pᵀJ_p − H_pl H_ll⁻¹ H_plᵀ, likewise rhs);
  * partials are `psum`-ed over ICI → every device has the full (D,D)
    reduced system, solves it redundantly (it is tiny), and updates its own
    landmark shard locally.

This is the "keyframe/map-block sharded Schur reduction with allreduce over
ICI" north star of BASELINE.json — sequence parallelism for SLAM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mvil_fusion_tpu.estimator import ba, factors as fac, state as st
from mvil_fusion_tpu.ops import preintegration as pre
from mvil_fusion_tpu.utils.precision import full_precision


def state_specs(axis: str) -> st.WindowState:
    """PartitionSpecs for WindowState: pose-side replicated, landmarks
    sharded."""
    r = P()
    return st.WindowState(p=r, q=r, v=r, ba=r, bg=r, tic=r, qic=r, td=r,
                          inv_depth=P(axis))


def feature_specs(axis: str) -> st.Features:
    s = P(axis)
    return st.Features(start=s, obs=s, vel=s, td_ref=s, mask=s,
                       depth_fixed=s, valid=s)


def _sharded_assemble(s, prob, focal, axis):
    """Per-device partial assembly + psum → full reduced system."""
    vs = fac.vision_system(s, prob.feats, focal)
    F_local = s.num_features
    W = s.window

    H_v = jnp.einsum("nri,nrj->ij", vs.Jg, vs.Jg)
    g_v = -jnp.einsum("nri,nr->i", vs.Jg, vs.r)
    Jg_f = vs.Jg.reshape(F_local, W, 2, -1)
    Jl_f = vs.Jl.reshape(F_local, W, 2)
    r_f = vs.r.reshape(F_local, W, 2)
    H_ll = jnp.einsum("fwr,fwr->f", Jl_f, Jl_f)
    H_pl = jnp.einsum("fwrd,fwr->df", Jg_f, Jl_f)
    g_l = -jnp.einsum("fwr,fwr->f", Jl_f, r_f)

    lam_free = ba._lam_free_mask(prob.feats)
    H_ll = jnp.where(lam_free, H_ll, 1.0)
    H_pl = jnp.where(lam_free[None, :], H_pl, 0.0)
    g_l = jnp.where(lam_free, g_l, 0.0)

    # replicated dense factors (identical on every device)
    imus = fac.imu_system(s, prob.preints, prob.interval_mask, prob.gravity)
    prs = fac.prior_system(prob.prior, s)
    anc = fac.anchor_system(s, prob.anchor_ref, 1e3,
                            jnp.logical_not(prob.prior.valid))
    extra_r = prob.extra_r + prob.extra_J @ st.state_boxminus(s, prob.extra_x0)
    Jd = jnp.concatenate([imus.J, prs.J, anc.J, prob.extra_J], axis=0)
    rd = jnp.concatenate([imus.r, prs.r, anc.r, extra_r], axis=0)

    H_pp = Jd.T @ Jd + jax.lax.psum(H_v, axis)
    g_p = -(Jd.T @ rd) + jax.lax.psum(g_v, axis)
    cost_dense = (imus.cost + prs.cost + anc.cost
                  + 0.5 * jnp.sum(extra_r * extra_r))
    cost = cost_dense + jax.lax.psum(vs.cost, axis)
    return ba.Assembled(H_pp, H_pl, H_ll, g_p, g_l, cost, lam_free)


def _sharded_cost(s, prob, focal, axis):
    vs = fac.vision_system(s, prob.feats, focal)
    imus = fac.imu_system(s, prob.preints, prob.interval_mask, prob.gravity)
    prs = fac.prior_system(prob.prior, s)
    anc = fac.anchor_system(s, prob.anchor_ref, 1e3,
                            jnp.logical_not(prob.prior.valid))
    extra_r = prob.extra_r + prob.extra_J @ st.state_boxminus(s, prob.extra_x0)
    dense = (imus.cost + prs.cost + anc.cost
             + 0.5 * jnp.sum(extra_r * extra_r))
    return dense + jax.lax.psum(vs.cost, axis)


def make_sharded_solver(mesh: Mesh, focal: float, iters: int = 8,
                        axis: str | None = None, mu0: float = 1e-4,
                        jitter: float = 1e-6):
    """Build a jitted distributed LM solver over `mesh`.

    Returns solve_fn(state, problem) -> SolveResult where `state.inv_depth`
    and the whole feature table are sharded along the mesh axis; everything
    else is replicated.  Schur partials reduce over ICI via psum.
    """
    if axis is None:
        axis = mesh.axis_names[0]

    @full_precision
    def _solve(s0, prob):
        D = st.pose_dim(s0.window)
        dtype = s0.p.dtype

        def step(carry, _):
            s, mu, n_acc = carry
            a = _sharded_assemble(s, prob, focal, axis)
            diag = jnp.diag(a.H_pp)
            Hd = a.H_pp + jnp.diag(mu * diag + jitter)
            Hll_d = a.H_ll * (1.0 + mu) + jitter
            inv_ll = 1.0 / Hll_d
            # partial Schur reduction over the local landmark shard + psum
            S_part = (a.H_pl * inv_ll[None, :]) @ a.H_pl.T
            rhs_part = a.H_pl @ (a.g_l * inv_ll)
            S = Hd - jax.lax.psum(S_part, axis)
            rhs = a.g_p - jax.lax.psum(rhs_part, axis)
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
            cost_try = _sharded_cost(s_try, prob, focal, axis)
            ok = jnp.isfinite(cost_try) & (cost_try < a.cost)
            s_new = jax.tree.map(lambda n, o: jnp.where(ok, n, o), s_try, s)
            mu_new = jnp.where(ok, jnp.maximum(mu * 0.4, 1e-6),
                               jnp.minimum(mu * 6.0, 1e3))
            return (s_new, mu_new, n_acc + ok.astype(jnp.int32)), a.cost

        init = (s0, jnp.asarray(mu0, dtype), jnp.zeros((), jnp.int32))
        (s, mu, n_acc), costs = jax.lax.scan(step, init, None, length=iters)
        cost_final = _sharded_cost(s, prob, focal, axis)
        return ba.SolveResult(state=s, cost0=costs[0], cost1=cost_final,
                              n_accepted=n_acc)

    sspec = state_specs(axis)
    pspec = ba.BAProblem(
        feats=feature_specs(axis),
        preints=pre.Preintegrated(*([P()] * 8)),
        interval_mask=P(),
        prior=fac.Prior(J=P(), r0=P(), x0=sspec._replace(inv_depth=P()),
                        valid=P()),
        gravity=P(),
        anchor_ref=sspec._replace(inv_depth=P()),
        extra_J=P(), extra_r=P(),
        extra_x0=sspec._replace(inv_depth=P()), fix_mask=P())
    out_spec = ba.SolveResult(state=sspec, cost0=P(), cost1=P(),
                              n_accepted=P())

    fn = shard_map(_solve, mesh=mesh, in_specs=(sspec, pspec),
                   out_specs=out_spec, check_vma=False)
    return jax.jit(fn)


def shard_problem(mesh: Mesh, s: st.WindowState, prob: ba.BAProblem,
                  axis: str | None = None):
    """Device_put state/problem with the sharded layout (host convenience)."""
    if axis is None:
        axis = mesh.axis_names[0]
    sspec = state_specs(axis)
    pspec = ba.BAProblem(
        feats=feature_specs(axis),
        preints=pre.Preintegrated(*([P()] * 8)),
        interval_mask=P(),
        prior=fac.Prior(J=P(), r0=P(), x0=sspec._replace(inv_depth=P()),
                        valid=P()),
        gravity=P(),
        anchor_ref=sspec._replace(inv_depth=P()),
        extra_J=P(), extra_r=P(),
        extra_x0=sspec._replace(inv_depth=P()), fix_mask=P())

    def put(tree, specs):
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            tree, specs)

    return put(s, sspec), put(prob, pspec)
