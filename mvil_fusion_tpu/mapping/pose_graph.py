"""Batched pose-graph optimization.

Replaces the reference's GTSAM iSAM2 incremental smoother (reference:
lidar_mapping/src/globalMappingIkdTree.cpp:111-114, update calls :259-271)
with a full batched Gauss-Newton re-solve: SLAM pose graphs here are
10²-10³ nodes, and re-linearizing the whole graph is a couple of fused
matmuls on the MXU — cheaper than maintaining incremental factorization
state (SURVEY.md §2.6).

Factors: SE(3) between factors, z-altitude priors (the reference's
GPSFactor on z for floor handling, :216-228), and an anchor on node 0.
All tables are static-capacity with masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


class PoseGraph(NamedTuple):
    """Static-capacity graph storage (a pytree)."""

    p: jnp.ndarray          # (N,3) node positions
    q: jnp.ndarray          # (N,4) node orientations
    node_mask: jnp.ndarray  # (N,)
    # between factors: T_i⁻¹ T_j ≈ (dp, dq)
    e_i: jnp.ndarray        # (E,) int32
    e_j: jnp.ndarray        # (E,)
    e_dp: jnp.ndarray       # (E,3)
    e_dq: jnp.ndarray       # (E,4)
    e_w: jnp.ndarray        # (E,) sqrt-info scalar (isotropic)
    e_mask: jnp.ndarray     # (E,)
    # z priors (GPS-z / floor factors)
    z_node: jnp.ndarray     # (Z,) int32
    z_val: jnp.ndarray      # (Z,)
    z_w: jnp.ndarray        # (Z,)
    z_mask: jnp.ndarray     # (Z,)


def empty_graph(n: int, e: int, z: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        p=jnp.zeros((n, 3), dtype),
        q=jnp.tile(lie.quat_identity(dtype), (n, 1)),
        node_mask=jnp.zeros((n,), bool),
        e_i=jnp.zeros((e,), jnp.int32), e_j=jnp.zeros((e,), jnp.int32),
        e_dp=jnp.zeros((e, 3), dtype),
        e_dq=jnp.tile(lie.quat_identity(dtype), (e, 1)),
        e_w=jnp.zeros((e,), dtype), e_mask=jnp.zeros((e,), bool),
        z_node=jnp.zeros((z,), jnp.int32), z_val=jnp.zeros((z,), dtype),
        z_w=jnp.zeros((z,), dtype), z_mask=jnp.zeros((z,), bool))


def _between_residual(p_i, q_i, p_j, q_j, dp, dq):
    """6-dim residual of T_i⁻¹ T_j vs the measured (dp, dq)."""
    dp_est, dq_est = lie.pose_between(p_i, q_i, p_j, q_j)
    r_p = dp_est - dp
    r_q = lie.quat_boxminus(dq_est, dq)
    return jnp.concatenate([r_p, r_q])


@full_precision
def solve(g: PoseGraph, iters: int = 10, anchor_weight: float = 1e4,
          mu0: float = 1e-6, jitter: float = 1e-6) -> PoseGraph:
    """Levenberg-Marquardt over all (masked) nodes; returns updated graph."""
    N = g.p.shape[0]
    dtype = g.p.dtype
    D = 6 * N

    def residuals_and_jac(p, q):
        def per_edge(i, j, dp, dq, w, m):
            def local(delta):
                pi = p[i] + delta[0:3]
                qi = lie.quat_mul(q[i], lie.quat_exp(delta[3:6]))
                pj = p[j] + delta[6:9]
                qj = lie.quat_mul(q[j], lie.quat_exp(delta[9:12]))
                return _between_residual(pi, qi, pj, qj, dp, dq) * w

            zeros = jnp.zeros((12,), dtype)
            r = local(zeros)
            J = jax.jacfwd(local)(zeros)          # (6,12)
            mm = m.astype(dtype)
            return r * mm, J * mm

        r_e, J_e = jax.vmap(per_edge)(g.e_i, g.e_j, g.e_dp, g.e_dq,
                                      g.e_w, g.e_mask)
        # z priors: r = (p_z - z_val) * w ; jacobian row on node z dim
        r_z = (p[g.z_node, 2] - g.z_val) * g.z_w * g.z_mask.astype(dtype)
        # anchor on node 0 (gauge)
        r_a = jnp.concatenate([p[0] - jax.lax.stop_gradient(p[0]),
                               jnp.zeros((3,), dtype)])
        return r_e, J_e, r_z, r_a

    def assemble(p, q):
        r_e, J_e, r_z, _ = residuals_and_jac(p, q)
        E = g.e_i.shape[0]
        # scatter edge jacobians into H via one-hot (6,D) per endpoint
        cols = jax.lax.broadcasted_iota(jnp.int32, (6, D), 1)

        def onehot(node):
            offs = 6 * node + jnp.arange(6, dtype=jnp.int32)
            return (cols == offs[:, None]).astype(dtype)

        def scatter_edge(Jf, i, j):
            return Jf[:, 0:6] @ onehot(i) + Jf[:, 6:12] @ onehot(j)

        Jg = jax.vmap(scatter_edge)(J_e, g.e_i, g.e_j)     # (E,6,D)
        H = jnp.einsum("eri,erj->ij", Jg, Jg)
        b = -jnp.einsum("eri,er->i", Jg, r_e)
        # z priors
        # r_z is already weighted; its jacobian row is wz at the node's z dim
        zsel = (6 * g.z_node + 2)
        wz = g.z_w * g.z_mask.astype(dtype)
        H = H.at[zsel, zsel].add(wz * wz)
        b = b.at[zsel].add(-(wz * r_z))
        # anchor node 0 (all 6 dofs)
        H = H.at[jnp.arange(6), jnp.arange(6)].add(anchor_weight)
        # inactive nodes: pin to keep H invertible
        inactive = ~g.node_mask
        diag_idx = (6 * jnp.arange(N)[:, None]
                    + jnp.arange(6)[None, :]).reshape(-1)
        pin = jnp.repeat(inactive, 6).astype(dtype) * 1e6
        H = H.at[diag_idx, diag_idx].add(pin)
        cost = 0.5 * (jnp.sum(r_e * r_e) + jnp.sum(r_z * r_z))
        return H, b, cost

    def cost_of(p, q):
        r_e, _, r_z, _ = residuals_and_jac(p, q)
        return 0.5 * (jnp.sum(r_e * r_e) + jnp.sum(r_z * r_z))

    def step(carry, _):
        p, q, mu = carry
        H, b, c0 = assemble(p, q)
        Hd = H + jnp.diag(mu * jnp.diag(H) + jitter)
        L, low = jax.scipy.linalg.cho_factor(
            Hd + jitter * jnp.eye(D, dtype=dtype), lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), b).reshape(N, 6)
        p_try = p + dx[:, 0:3]
        q_try = jax.vmap(lie.quat_boxplus)(q, dx[:, 3:6])
        c1 = cost_of(p_try, q_try)
        ok = jnp.isfinite(c1) & (c1 < c0)
        p_new = jnp.where(ok, p_try, p)
        q_new = jnp.where(ok, q_try, q)
        mu_new = jnp.where(ok, jnp.maximum(mu * 0.3, 1e-8),
                           jnp.minimum(mu * 8.0, 1e4))
        return (p_new, q_new, mu_new), c0

    (p, q, _), _ = jax.lax.scan(step, (g.p, g.q, jnp.asarray(mu0, dtype)),
                                None, length=iters)
    return g._replace(p=p, q=jax.vmap(lie.quat_normalize)(q))
