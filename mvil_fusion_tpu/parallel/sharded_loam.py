"""Query-sharded distributed LOAM scan-to-map.

The (10³ queries × 10⁴ map points) brute-force correspondence distance
matmul is the single biggest matmul in the engine (ops/loam_icp.py knn);
here the QUERY axis (source corner/surf features) shards across the mesh,
the map buffers replicate (a few MB), each device associates and
linearizes its shard, and the 6-dof normal equations reduce with one
`psum` over ICI per GN iteration — identical math to the single-device
solve (reference: localMapping.cpp:586-793 does this with one kd-tree and
one thread).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvil_fusion_tpu.ops import loam_icp
from mvil_fusion_tpu.utils import lie
from mvil_fusion_tpu.utils.precision import full_precision


def make_sharded_scan_to_map(mesh: Mesh, outer_iters: int = 2,
                             gn_iters: int = 4,
                             max_corr_dist: float = 1.0,
                             axis: str | None = None):
    """Distributed loam_icp.scan_to_map: source features shard on `axis`,
    maps replicate, H/g partials psum-reduce.  Bit-equivalent to the
    single-device solve (same global normal equations)."""
    if axis is None:
        axis = mesh.axis_names[0]

    @full_precision
    def _s2m(corner_src, corner_mask, surf_src, surf_mask,
             corner_map, corner_map_mask, surf_map, surf_map_mask, p0, q0):
        dtype = corner_src.dtype

        def outer(carry, _):
            p, q = carry
            corr = loam_icp.find_correspondences(
                corner_src, corner_mask, surf_src, surf_mask,
                corner_map, corner_map_mask, surf_map, surf_map_mask,
                p, q, max_corr_dist)

            def inner(carry2, _):
                p2, q2 = carry2

                def res_fn(delta):
                    pp = p2 + delta[3:6]
                    qq = lie.quat_mul(q2, lie.quat_exp(delta[0:3]))
                    re3, we, rp, wp = loam_icp._residuals(corr, pp, qq)
                    return jnp.concatenate(
                        [(re3 * we[:, None]).reshape(-1), rp * wp])

                zeros = jnp.zeros((6,), dtype)
                r = res_fn(zeros)
                J = jax.jacfwd(res_fn)(zeros)
                # per-shard partials -> one allreduce per GN iteration
                H = jax.lax.psum(J.T @ J, axis) \
                    + 1e-6 * jnp.eye(6, dtype=dtype)
                g = jax.lax.psum(-J.T @ r, axis)
                dx = jnp.linalg.solve(H, g)
                q3 = lie.quat_boxplus(q2, dx[0:3])
                p3 = p2 + dx[3:6]
                return (p3, q3), jnp.linalg.norm(dx)

            (p, q), dxs = jax.lax.scan(inner, (p, q), None,
                                       length=gn_iters)
            return (p, q), dxs[-1]

        (p, q), _ = jax.lax.scan(outer, (p0.astype(dtype),
                                         q0.astype(dtype)), None,
                                 length=outer_iters)
        corr = loam_icp.find_correspondences(
            corner_src, corner_mask, surf_src, surf_mask,
            corner_map, corner_map_mask, surf_map, surf_map_mask, p, q,
            max_corr_dist)
        n_edge = jax.lax.psum(jnp.sum(corr.edge_ok), axis)
        n_plane = jax.lax.psum(jnp.sum(corr.plane_ok), axis)
        return p, q, n_edge, n_plane

    fn = shard_map(
        _s2m, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(fn)


def shard_features(mesh: Mesh, corner, corner_mask, surf, surf_mask,
                   axis: str | None = None):
    if axis is None:
        axis = mesh.axis_names[0]
    s = NamedSharding(mesh, P(axis))
    return (jax.device_put(corner, s), jax.device_put(corner_mask, s),
            jax.device_put(surf, s), jax.device_put(surf_mask, s))
