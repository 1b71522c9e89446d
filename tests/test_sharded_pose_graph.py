"""Edge-sharded pose-graph CG == single-device solve_cg.

Runs on the conftest's 8-virtual-device CPU backend (the same layout the
driver's dryrun_multichip validates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mvil_fusion_tpu.mapping import pose_graph as pg
from mvil_fusion_tpu.parallel.sharded_pose_graph import solve_cg_sharded


def _random_graph(rng, N=64, E=256, Z=16, n_nodes=40, n_edges=120,
                  n_z=8):
    g = pg.empty_graph(N, E, Z)
    # ground-truth chain with noise
    p_gt = np.cumsum(rng.normal(0, 0.5, (n_nodes, 3)), axis=0)
    p0 = p_gt + rng.normal(0, 0.05, p_gt.shape)
    q0 = np.tile([1.0, 0, 0, 0], (n_nodes, 1))
    e_i = np.zeros(E, np.int32)
    e_j = np.zeros(E, np.int32)
    e_dp = np.zeros((E, 3), np.float32)
    e_w = np.zeros(E, np.float32)
    e_mask = np.zeros(E, bool)
    for k in range(n_edges):
        if k < n_nodes - 1:
            i, j = k, k + 1
        else:
            i = int(rng.integers(0, n_nodes - 2))
            j = int(rng.integers(i + 1, n_nodes))
        e_i[k], e_j[k] = i, j
        e_dp[k] = p_gt[j] - p_gt[i] + rng.normal(0, 0.01, 3)
        e_w[k] = 10.0
        e_mask[k] = True
    z_node = np.zeros(Z, np.int32)
    z_val = np.zeros(Z, np.float32)
    z_w = np.zeros(Z, np.float32)
    z_mask = np.zeros(Z, bool)
    for k in range(n_z):
        n = int(rng.integers(0, n_nodes))
        z_node[k] = n
        z_val[k] = p_gt[n, 2]
        z_w[k] = 5.0
        z_mask[k] = True
    node_mask = np.zeros(N, bool)
    node_mask[:n_nodes] = True
    p_full = np.zeros((N, 3), np.float32)
    p_full[:n_nodes] = p0
    q_full = np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32)
    return g._replace(
        p=jnp.asarray(p_full), q=jnp.asarray(q_full),
        node_mask=jnp.asarray(node_mask),
        e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
        e_dp=jnp.asarray(e_dp), e_w=jnp.asarray(e_w),
        e_mask=jnp.asarray(e_mask),
        z_node=jnp.asarray(z_node), z_val=jnp.asarray(z_val),
        z_w=jnp.asarray(z_w), z_mask=jnp.asarray(z_mask)), p_gt


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_cg_matches_single_device(rng):
    g, p_gt = _random_graph(rng)
    single = pg.solve_cg(g, iters=6, cg_iters=48)
    mesh = Mesh(np.array(jax.devices()[:8]), ("graph",))
    sharded = solve_cg_sharded(g, mesh, axis="graph", iters=6, cg_iters=48)
    np.testing.assert_allclose(np.asarray(sharded.p),
                               np.asarray(single.p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sharded.q),
                               np.asarray(single.q), atol=2e-4)
    # and the solve actually improved the graph toward ground truth
    n = int(np.asarray(g.node_mask).sum())
    err0 = np.linalg.norm(np.asarray(g.p)[:n] - p_gt, axis=1).mean()
    err1 = np.linalg.norm(np.asarray(sharded.p)[:n] - p_gt, axis=1).mean()
    assert err1 < err0 * 0.9
