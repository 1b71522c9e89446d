"""Point-sharded distributed registration (VGICP over a device mesh).

The map-block / point axis is the scale axis of LiDAR registration: source
points shard across devices, every device evaluates its shard's Mahalanobis
residuals against (replicated) voxel maps, and the 6-dof normal equations
reduce with a `psum` over ICI — the registration analog of the
keyframe-sharded BA (BASELINE.json north star; no reference counterpart,
fast_gicp parallelizes with OpenMP threads on one CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvil_fusion_tpu.ops import voxel
from mvil_fusion_tpu.ops.vgicp import VgicpResult, _inv3
from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


def make_sharded_vgicp(mesh: Mesh, iters: int = 12,
                       max_corr_dist: float = 0.8, eps: float = 5e-4,
                       axis: str | None = None):
    """Build a jitted distributed VGICP aligner over `mesh`.

    Source points (and their masks) are sharded along the mesh axis; both
    voxel maps are replicated (they are hash tables — a few MB)."""
    if axis is None:
        axis = mesh.axis_names[0]

    @full_precision
    def _align(src, src_mask, tgt_map, src_map, p0, q0):
        dtype = src.dtype
        n = src.shape[0]                     # local shard size
        _, cov_s, hit_s = voxel.lookup(src_map, src)
        w_valid = src_mask & hit_s

        def gn_step(carry, _):
            p, q, prev_dx = carry
            R = lie.quat_to_mat(q)
            ts = lie.quat_rotate(q[None, :], src) + p[None, :]
            mean_t, cov_t, hit_t = voxel.lookup7(tgt_map, ts)
            d = ts - mean_t
            dist2 = jnp.sum(d * d, axis=-1)
            ok = (w_valid & hit_t
                  & (dist2 < max_corr_dist * max_corr_dist)).astype(dtype)
            C = cov_t + jnp.einsum("ij,njk,lk->nil", R, cov_s, R)
            W = _inv3(C)
            Jr = -jnp.einsum("ij,njk->nik", R, lie.skew(src))
            J = jnp.concatenate([Jr, jnp.broadcast_to(
                jnp.eye(3, dtype=dtype), (n, 3, 3))], axis=-1)
            WJ = jnp.einsum("nij,njk->nik", W, J)
            # per-device partials → allreduce over ICI
            H = jax.lax.psum(
                jnp.einsum("nji,njk->ik", J * ok[:, None, None], WJ), axis)
            g = jax.lax.psum(
                -jnp.einsum("nji,njk,nk->i", J * ok[:, None, None], W, d),
                axis)
            H = H + 1e-6 * jnp.eye(6, dtype=dtype)
            dx = jnp.linalg.solve(H, g)
            q_new = lie.quat_boxplus(q, dx[:3])
            p_new = p + dx[3:]
            return (p_new, q_new, jnp.linalg.norm(dx)), None

        (p, q, last_dx), _ = jax.lax.scan(
            gn_step, (p0.astype(dtype), q0.astype(dtype),
                      jnp.asarray(jnp.inf, dtype)), None, length=iters)

        ts = lie.quat_rotate(q[None, :], src) + p[None, :]
        mean_t, _, hit_t = voxel.lookup7(tgt_map, ts)
        d2 = jnp.sum((ts - mean_t) ** 2, axis=-1)
        ok = w_valid & hit_t & (d2 < max_corr_dist * max_corr_dist)
        n_corr = jax.lax.psum(jnp.sum(ok), axis)
        fitness = jax.lax.psum(jnp.sum(jnp.where(ok, d2, 0.0)), axis) / \
            jnp.maximum(n_corr, 1)
        converged = (last_dx < eps) & (n_corr > 50)
        return VgicpResult(p=p, q=q, fitness=fitness, n_corr=n_corr,
                           converged=converged)

    vm_spec = voxel.GaussianVoxelMap(mean=P(), cov=P(), count=P(),
                                     coords=P(), leaf=P(), table_size=P())
    fn = shard_map(_align, mesh=mesh,
                   in_specs=(P(axis), P(axis), vm_spec, vm_spec, P(), P()),
                   out_specs=VgicpResult(p=P(), q=P(), fitness=P(),
                                         n_corr=P(), converged=P()),
                   check_vma=False)
    return jax.jit(fn)


def shard_points(mesh: Mesh, pts, mask, axis: str | None = None):
    if axis is None:
        axis = mesh.axis_names[0]
    s = NamedSharding(mesh, P(axis))
    return jax.device_put(pts, s), jax.device_put(mask, s)
