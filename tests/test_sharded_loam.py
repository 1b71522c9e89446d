"""Query-sharded LOAM scan-to-map equals the single-device solve on the
8-virtual-device CPU mesh (the third sharded kernel; the psum'd normal
equations must reproduce the global H/g exactly)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvil_fusion_tpu.ops import loam_icp
from mvil_fusion_tpu.parallel import mesh as mesh_lib, sharded_loam
from mvil_fusion_tpu.utils import lie


def _world(rng, n_c=128, n_s=256, m_c=1024, m_s=2048):
    # corner map: vertical LINE stacks (edge clusters must be line-like,
    # λ2 > 3λ1); surf map: horizontal planar sheets
    n_lines = m_c // 16
    xy = rng.uniform(-8, 8, (n_lines, 2)).astype(np.float32)
    z = np.linspace(-2.0, 2.0, 16, dtype=np.float32)
    cmap = np.concatenate([
        np.column_stack([np.repeat(xy[:, 0], 16), np.repeat(xy[:, 1], 16),
                         np.tile(z, n_lines)])]).astype(np.float32)
    cmap += 0.01 * rng.standard_normal(cmap.shape).astype(np.float32)
    smap = rng.uniform(-8, 8, (m_s, 3)).astype(np.float32)
    smap[:, 2] = np.round(smap[:, 2] / 2.0) * 2.0 \
        + 0.01 * rng.standard_normal(m_s).astype(np.float32)
    corner = cmap[rng.integers(0, m_c, n_c)] + [0.06, -0.04, 0.02]
    surf = smap[rng.integers(0, m_s, n_s)] + [0.06, -0.04, 0.02]
    return (jnp.asarray(corner), jnp.ones(n_c, bool),
            jnp.asarray(surf), jnp.ones(n_s, bool),
            jnp.asarray(cmap), jnp.ones(m_c, bool),
            jnp.asarray(smap), jnp.ones(m_s, bool))


def test_sharded_scan_to_map_matches_single_device(rng):
    n_dev = len(jax.devices())
    assert n_dev >= 8
    mesh = mesh_lib.make_mesh(8)
    args = _world(rng)
    p0, q0 = jnp.zeros(3), lie.quat_identity()

    s2m = sharded_loam.make_sharded_scan_to_map(mesh, outer_iters=2,
                                                gn_iters=3)
    c_sh, cm_sh, s_sh, sm_sh = sharded_loam.shard_features(
        mesh, args[0], args[1], args[2], args[3])
    p_d, q_d, ne, npl = s2m(c_sh, cm_sh, s_sh, sm_sh, *args[4:], p0, q0)

    p_1, q_1, ne1, npl1, _ = loam_icp.scan_to_map(
        *args, p0, q0, outer_iters=2, gn_iters=3)

    assert int(ne) == int(ne1)
    assert int(npl) == int(npl1)
    np.testing.assert_allclose(np.asarray(p_d), np.asarray(p_1), atol=1e-4)
    np.testing.assert_allclose(np.abs(np.dot(np.asarray(q_d),
                                             np.asarray(q_1))),
                               1.0, atol=1e-6)
    # and the solve actually converged toward the injected offset
    assert np.linalg.norm(np.asarray(p_d) + [0.06, -0.04, 0.02]) < 0.05
