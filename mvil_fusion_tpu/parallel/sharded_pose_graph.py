"""Edge-sharded pose-graph optimization over a device mesh.

The single-device `mapping.pose_graph.solve_cg` is matrix-free: every
LM step is `cg_iters` sparse matvecs whose only reductions are per-node
segment-sums of per-edge (6,) contributions.  That structure shards
directly on the FACTOR axis — the moral equivalent of the reference's
north star ("keyframe-sharded reduction", BASELINE.json; SURVEY.md §2.6
last row) applied to the global graph:

  * each device owns E/n_dev between-factors and Z/n_dev z-priors,
  * the (N,6) state is replicated,
  * every matvec psums two (N,6) accumulators over the mesh axis
    (49 KiB at N=1024 — rides ICI, not DCN),
  * the LM/CG control flow runs replicated and stays bit-identical on
    every device because it only consumes psum'd values.

Equality with the single-device solver is asserted by
tests/test_sharded_pose_graph.py and the driver's dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mvil_fusion_tpu.mapping.pose_graph import PoseGraph, _between_residual
from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


@full_precision
def solve_cg_sharded(g: PoseGraph, mesh: Mesh, axis: str = "graph",
                     iters: int = 10, cg_iters: int = 64,
                     anchor_weight: float = 1e4, mu0: float = 1e-6,
                     jitter: float = 1e-6, cg_tol: float = 1e-12,
                     xtol: float = 1e-8) -> PoseGraph:
    """LM + block-Jacobi CG with the edge/z tables sharded over `axis`.

    Capacities E and Z must divide the mesh axis size (pad with masked
    slots — the tables are static-capacity anyway)."""
    N = g.p.shape[0]
    dtype = g.p.dtype
    n_dev = mesh.shape[axis]
    assert g.e_i.shape[0] % n_dev == 0 and g.z_node.shape[0] % n_dev == 0, (
        "edge/z capacities must divide the mesh axis (pad masked slots)")

    es = P(axis)       # sharded on the factor axis
    rs = P()           # replicated

    @partial(shard_map, mesh=mesh,
             in_specs=(rs, rs, rs, es, es, es, es, es, es, es, es, es, es),
             out_specs=(rs, rs),
             check_rep=False)
    def run(p0, q0, node_mask, e_i, e_j, e_dp, e_dq, e_w, e_mask,
            z_node, z_val, z_w, z_mask):
        zw = z_w * z_mask.astype(dtype)
        inactive_pin = (~node_mask).astype(dtype) * 1e6
        anchor = jnp.zeros((N,), dtype).at[0].set(anchor_weight)

        def edge_system(p, q):
            def per_edge(i, j, dp, dq, w, m):
                def local(delta):
                    pi = p[i] + delta[0:3]
                    qi = lie.quat_mul(q[i], lie.quat_exp(delta[3:6]))
                    pj = p[j] + delta[6:9]
                    qj = lie.quat_mul(q[j], lie.quat_exp(delta[9:12]))
                    return _between_residual(pi, qi, pj, qj, dp, dq) * w

                zeros = jnp.zeros((12,), dtype)
                r = local(zeros)
                J = jax.jacfwd(local)(zeros)
                mm = m.astype(dtype)
                return r * mm, J * mm

            return jax.vmap(per_edge)(e_i, e_j, e_dp, e_dq, e_w, e_mask)

        def z_residual(p):
            return (p[z_node, 2] - z_val) * zw

        def cost_of(p, q):
            r_e, _ = edge_system(p, q)
            r_z = z_residual(p)
            # factor-axis reduction -> replicated scalar
            return 0.5 * jax.lax.psum(
                jnp.sum(r_e * r_e) + jnp.sum(r_z * r_z), axis)

        def step(p, q, mu):
            r_e, J_e = edge_system(p, q)
            Ji = J_e[:, :, 0:6]
            Jj = J_e[:, :, 6:12]
            r_z = z_residual(p)

            b = (jnp.zeros((N, 6), dtype)
                 .at[e_i].add(-jnp.einsum("er,erk->ek", r_e, Ji))
                 .at[e_j].add(-jnp.einsum("er,erk->ek", r_e, Jj)))
            b = b.at[z_node, 2].add(-(zw * r_z))
            b = jax.lax.psum(b, axis)                         # (N,6)

            Dblk = (jnp.zeros((N, 6, 6), dtype)
                    .at[e_i].add(jnp.einsum("eri,erj->eij", Ji, Ji))
                    .at[e_j].add(jnp.einsum("eri,erj->eij", Jj, Jj)))
            Dblk = Dblk.at[z_node, 2, 2].add(zw * zw)
            Dblk = jax.lax.psum(Dblk, axis)                   # (N,6,6)
            diag_extra = (anchor + inactive_pin)[:, None]
            dh = jnp.einsum("nkk->nk", Dblk)
            damp = mu * dh + jitter + diag_extra
            Mblk = Dblk + jax.vmap(jnp.diag)(damp)
            Minv = jnp.linalg.inv(
                Mblk + 1e-8 * jnp.eye(6, dtype=dtype)[None])

            def matvec(x):
                t = (jnp.einsum("erk,ek->er", Ji, x[e_i])
                     + jnp.einsum("erk,ek->er", Jj, x[e_j]))
                y = (jnp.zeros((N, 6), dtype)
                     .at[e_i].add(jnp.einsum("er,erk->ek", t, Ji))
                     .at[e_j].add(jnp.einsum("er,erk->ek", t, Jj)))
                y = y.at[z_node, 2].add((zw * zw) * x[z_node, 2])
                # ONE (N,6) psum per matvec; the damped diagonal is
                # replicated and must be added AFTER the reduction
                return jax.lax.psum(y, axis) + damp * x

            def pc(v):
                return jnp.einsum("nij,nj->ni", Minv, v)

            x0 = jnp.zeros((N, 6), dtype)
            r0 = b - matvec(x0)
            z0 = pc(r0)
            rz0 = jnp.sum(r0 * z0)

            # early-terminated PCG, same guards as the single-device
            # solver (pose_graph.solve_cg).  rz is built exclusively
            # from psum'd quantities, so the stop decision is replicated
            # bit-identically on every shard — the while_loop stays in
            # lockstep across the mesh with no extra collective.
            def cg_cond(c):
                _, _, _, _, rz, k = c
                return (k < cg_iters) & (rz > cg_tol * rz0)

            def cg_body(c):
                x, r, z_, pdir, rz, k = c
                Ap = matvec(pdir)
                alpha = rz / jnp.maximum(jnp.sum(pdir * Ap), 1e-30)
                x = x + alpha * pdir
                r = r - alpha * Ap
                z_ = pc(r)
                rz_new = jnp.sum(r * z_)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                pdir = z_ + beta * pdir
                return (x, r, z_, pdir, rz_new, k + 1)

            dx = jax.lax.while_loop(
                cg_cond, cg_body, (x0, r0, z0, z0, rz0, 0))[0]

            c0 = 0.5 * jax.lax.psum(
                jnp.sum(r_e * r_e) + jnp.sum(r_z * r_z), axis)
            p_try = p + dx[:, 0:3]
            q_try = jax.vmap(lie.quat_boxplus)(q, dx[:, 3:6])
            c1 = cost_of(p_try, q_try)
            ok = jnp.isfinite(c1) & (c1 < c0)
            p_new = jnp.where(ok, p_try, p)
            q_new = jnp.where(ok, q_try, q)
            mu_new = jnp.where(ok, jnp.maximum(mu * 0.3, 1e-8),
                               jnp.minimum(mu * 8.0, 1e4))
            conv = ok & (jnp.max(jnp.abs(dx)) < xtol)
            return p_new, q_new, mu_new, conv

        def lm_cond(c):
            _, _, _, k, conv = c
            return (k < iters) & ~conv

        def lm_body(c):
            p, q, mu, k, _ = c
            p, q, mu, conv = step(p, q, mu)
            return p, q, mu, k + 1, conv

        p, q, _, _, _ = jax.lax.while_loop(
            lm_cond, lm_body,
            (p0, q0, jnp.asarray(mu0, dtype), 0, jnp.asarray(False)))
        return p, jax.vmap(lie.quat_normalize)(q)

    p, q = run(g.p, g.q, g.node_mask, g.e_i, g.e_j, g.e_dp, g.e_dq,
               g.e_w, g.e_mask, g.z_node, g.z_val, g.z_w, g.z_mask)
    return g._replace(p=p, q=q)
