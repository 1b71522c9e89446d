import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig, GlobalMappingConfig
from mvil_fusion_tpu.mapping import pose_graph as pg
from mvil_fusion_tpu.mapping.global_mapping import GlobalMapper
from mvil_fusion_tpu.mapping.local_mapping import Submap
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld
from mvil_fusion_tpu.ops import scancontext as sc
from mvil_fusion_tpu.utils import lie


# ---------------------------------------------------------------------------
# ScanContext
# ---------------------------------------------------------------------------

def room_cloud(rng, n=4000):
    """Asymmetric structured cloud (box walls + interior boxes)."""
    box = BoxWorld()
    dirs = rng.normal(size=(n, 3))
    dirs[:, 2] *= 0.3
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = box.ray_range(np.zeros(3), dirs)
    return (dirs * r[:, None]).astype(np.float32)


def test_sc_descriptor_rotation_shift(rng):
    pts = room_cloud(rng)
    m = jnp.ones(len(pts), bool)
    d0 = sc.make_descriptor(jnp.asarray(pts), m)
    # rotate the cloud by 90° about z → descriptor shifts by S/4 sectors
    ang = np.pi / 2
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    d1 = sc.make_descriptor(jnp.asarray(pts @ R.T), m)
    dist, shift = sc.sc_distance(d0, d1)
    assert float(dist) < 0.05, float(dist)
    assert int(shift) in (14, 15, 16, 44, 45, 46), int(shift)
    # ring key is rotation invariant
    np.testing.assert_allclose(np.asarray(sc.ring_key(d0)),
                               np.asarray(sc.ring_key(d1)), atol=0.3)


def test_sc_detects_same_place(rng):
    pts = room_cloud(rng)
    m = jnp.ones(len(pts), bool)
    N = 64
    db = np.zeros((N, 20, 60), np.float32)
    keys = np.zeros((N, 20), np.float32)
    mask = np.zeros(N, bool)
    # fill db with perturbed other-place clouds + the true place at idx 17
    for k in range(24):
        other = room_cloud(np.random.default_rng(100 + k)) + \
            np.asarray([6.0, -4.0, 0.0], np.float32) * (1 + k % 3)
        d = sc.make_descriptor(jnp.asarray(other), jnp.ones(len(other), bool))
        db[k] = np.asarray(d)
        keys[k] = np.asarray(sc.ring_key(d))
        mask[k] = True
    ang = 0.6
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    d_same = sc.make_descriptor(jnp.asarray(pts @ R.T), m)
    db[17] = np.asarray(d_same)
    keys[17] = np.asarray(sc.ring_key(d_same))
    mask[17] = True
    q_desc = sc.make_descriptor(jnp.asarray(pts), m)
    cands = sc.detect_loop(q_desc, sc.ring_key(q_desc), jnp.asarray(db),
                           jnp.asarray(keys), jnp.asarray(mask))
    best = int(np.argmin(np.asarray(cands.dist)))
    assert int(np.asarray(cands.idx)[best]) == 17
    assert float(np.asarray(cands.dist)[best]) < 0.15


# ---------------------------------------------------------------------------
# pose graph
# ---------------------------------------------------------------------------

def make_loop_graph(n=40, drift=0.03, rng=None):
    """Square loop with odometry drift + one loop-closure edge."""
    rng = rng or np.random.default_rng(0)
    g = pg.empty_graph(64, 128, 64)
    # ground truth: walk around a square
    side = n // 4
    p_true = []
    q_true = []
    p = np.zeros(3)
    yaw = 0.0
    for k in range(n):
        if k and k % side == 0:
            yaw += np.pi / 2
        p = p + np.asarray([np.cos(yaw), np.sin(yaw), 0.0])
        p_true.append(p.copy())
        q_true.append(np.asarray(lie.quat_exp(
            jnp.asarray([0, 0, yaw], jnp.float32))))
    # noisy odometry chain → initial estimates accumulate drift
    p_est = [p_true[0]]
    q_est = [q_true[0]]
    for k in range(1, n):
        dp, dq = lie.pose_between(
            jnp.asarray(p_true[k - 1], jnp.float32), jnp.asarray(q_true[k - 1]),
            jnp.asarray(p_true[k], jnp.float32), jnp.asarray(q_true[k]))
        dp = np.asarray(dp) + rng.normal(scale=drift, size=3)
        p_n, q_n = lie.pose_compose(jnp.asarray(p_est[-1], jnp.float32),
                                    jnp.asarray(q_est[-1]),
                                    jnp.asarray(dp, jnp.float32), dq)
        p_est.append(np.asarray(p_n))
        q_est.append(np.asarray(q_n))
        g = g._replace(e_i=g.e_i.at[k - 1].set(k - 1),
                       e_j=g.e_j.at[k - 1].set(k),
                       e_dp=g.e_dp.at[k - 1].set(jnp.asarray(dp, jnp.float32)),
                       e_dq=g.e_dq.at[k - 1].set(dq),
                       e_w=g.e_w.at[k - 1].set(10.0),
                       e_mask=g.e_mask.at[k - 1].set(True))
    # loop closure: node n-1 ↔ node 0 with the TRUE relative pose
    dp, dq = lie.pose_between(jnp.asarray(p_true[0], jnp.float32),
                              jnp.asarray(q_true[0]),
                              jnp.asarray(p_true[n - 1], jnp.float32),
                              jnp.asarray(q_true[n - 1]))
    g = g._replace(e_i=g.e_i.at[n - 1].set(0), e_j=g.e_j.at[n - 1].set(n - 1),
                   e_dp=g.e_dp.at[n - 1].set(dp), e_dq=g.e_dq.at[n - 1].set(dq),
                   e_w=g.e_w.at[n - 1].set(20.0),
                   e_mask=g.e_mask.at[n - 1].set(True))
    g = g._replace(p=g.p.at[:n].set(jnp.asarray(np.asarray(p_est))),
                   q=g.q.at[:n].set(jnp.asarray(np.asarray(q_est))),
                   node_mask=g.node_mask.at[:n].set(True))
    return g, np.asarray(p_true), n


def test_pose_graph_closes_loop():
    g, p_true, n = make_loop_graph()
    err_before = np.linalg.norm(
        np.asarray(g.p[:n]) - p_true, axis=1)
    g2 = pg.solve(g, iters=15)
    err_after = np.linalg.norm(np.asarray(g2.p[:n]) - p_true, axis=1)
    assert err_after.max() < 0.55 * err_before.max(), (
        err_before.max(), err_after.max())
    assert err_after.max() < 0.25, err_after.max()


def test_pose_graph_z_prior_flattens():
    g, p_true, n = make_loop_graph()
    # corrupt z of the estimates, then add strong z priors at 0
    g = g._replace(p=g.p.at[:n, 2].add(
        jnp.asarray(np.linspace(0, 1.5, n), jnp.float32)))
    for k in range(n):
        g = g._replace(z_node=g.z_node.at[k].set(k),
                       z_val=g.z_val.at[k].set(0.0),
                       z_w=g.z_w.at[k].set(2.0),
                       z_mask=g.z_mask.at[k].set(True))
    g2 = pg.solve(g, iters=15)
    assert np.abs(np.asarray(g2.p[:n, 2])).max() < 0.15


# ---------------------------------------------------------------------------
# global mapper end-to-end: square loop of submaps
# ---------------------------------------------------------------------------

def test_global_mapper_loop_closure(rng):
    box = BoxWorld(room=(40.0, 34.0, 8.0))
    cfg = SystemConfig(global_mapping=GlobalMappingConfig(
        skip_recent_poses=6, poses_before_reclosing=4,
        proximity_threshold=4.0, max_tolerable_fitness=0.6))
    gm = GlobalMapper(cfg)

    # ground-truth square path of keyed poses; odometry drifts in x/y
    n = 16
    side = 4
    p = np.zeros(3)
    yaw = 0.0
    drift = np.zeros(3)
    infos = []
    for k in range(n):
        if k and k % side == 0:
            yaw += np.pi / 2
        if k:
            p = p + 2.8 * np.asarray([np.cos(yaw), np.sin(yaw), 0.0])
        q = np.asarray(lie.quat_exp(jnp.asarray([0, 0, yaw], jnp.float32)))
        # body-frame scan at this pose
        Rw = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
        dirs = rng.normal(size=(5000, 3))
        dirs[:, 2] *= 0.25
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        rr = box.ray_range(p, dirs @ Rw.T)
        ok = rr < 60.0
        pts_b = (dirs * rr[:, None])[ok].astype(np.float32)
        drift += rng.normal(scale=0.04, size=3) + np.asarray([0.01, 0.008, 0])
        sm = Submap(t=float(k), p_w=(p + drift).astype(np.float32),
                    q_w=q.astype(np.float32), pts=pts_b,
                    odom_p=(p + drift).astype(np.float32),
                    odom_q=q.astype(np.float32))
        infos.append(gm.add_submap(sm))

    assert gm.n_nodes == n
    # trajectory should stay near truth thanks to s2m + loops (truth has
    # z=0 everywhere; drift was injected in odometry)
    traj = gm.trajectory()
    errs = [np.linalg.norm(traj[k][1][:2] -
                           np.asarray([0, 0])) for k in [0]]
    # final node should be near the true final pose despite odometry drift
    # (the square returns toward the start)
    assert np.isfinite(np.asarray([p for (_, p, _) in traj])).all()
    assert gm.n_edges >= n - 1
    # map cloud is well-formed
    mp = gm.global_map()
    assert len(mp) > 1000
    assert np.isfinite(mp).all()


def test_pose_graph_cg_matches_dense():
    """solve_cg (matrix-free block-Jacobi PCG) reaches the same solution as
    the dense Cholesky solve on the loop graph, including z priors."""
    g, p_true, n = make_loop_graph()
    for k in range(0, n, 3):
        g = g._replace(z_node=g.z_node.at[k // 3].set(k),
                       z_val=g.z_val.at[k // 3].set(float(p_true[k, 2])),
                       z_w=g.z_w.at[k // 3].set(1.5),
                       z_mask=g.z_mask.at[k // 3].set(True))
    g_dense = pg.solve(g, iters=15)
    g_cg = pg.solve_cg(g, iters=15, cg_iters=64)
    err_d = np.linalg.norm(np.asarray(g_dense.p[:n]) - p_true, axis=1)
    err_c = np.linalg.norm(np.asarray(g_cg.p[:n]) - p_true, axis=1)
    # both solve the loop; CG tracks dense closely
    assert err_c.max() < 0.25, err_c.max()
    np.testing.assert_allclose(np.asarray(g_cg.p[:n]),
                               np.asarray(g_dense.p[:n]), atol=0.05)


def test_pose_graph_cg_at_capacity_512():
    """The CG solver runs at full reference-scale capacity (512 nodes,
    2048 edges) — memory linear in caps, no (E,6,6N) intermediate."""
    rng = np.random.default_rng(5)
    N, E = 512, 2048
    g = pg.empty_graph(N, E, 64)
    # ground truth: a noisy 3-D helix
    th = np.linspace(0, 8 * np.pi, N)
    p_true = np.stack([10 * np.cos(th), 10 * np.sin(th),
                       np.linspace(0, 12, N)], 1).astype(np.float32)
    q_true = np.tile(np.asarray([1, 0, 0, 0], np.float32), (N, 1))
    p_est = [p_true[0]]
    e = 0
    for k in range(1, N):
        dp = p_true[k] - p_true[k - 1] + rng.normal(scale=0.03, size=3)
        p_est.append(p_est[-1] + dp)
        g = g._replace(e_i=g.e_i.at[e].set(k - 1),
                       e_j=g.e_j.at[e].set(k),
                       e_dp=g.e_dp.at[e].set(
                           jnp.asarray(p_true[k] - p_true[k - 1])),
                       e_w=g.e_w.at[e].set(10.0),
                       e_mask=g.e_mask.at[e].set(True))
        e += 1
    # dense cross-bracing up to the full edge budget
    while e < E:
        i, j = sorted(rng.integers(0, N, 2).tolist())
        if i == j:
            continue
        g = g._replace(e_i=g.e_i.at[e].set(i), e_j=g.e_j.at[e].set(j),
                       e_dp=g.e_dp.at[e].set(
                           jnp.asarray(p_true[j] - p_true[i])),
                       e_w=g.e_w.at[e].set(5.0),
                       e_mask=g.e_mask.at[e].set(True))
        e += 1
    g = g._replace(p=jnp.asarray(np.asarray(p_est)),
                   node_mask=g.node_mask.at[:].set(True))
    err_before = np.linalg.norm(np.asarray(g.p) - p_true, axis=1)
    g2 = pg.solve_cg(g, iters=8, cg_iters=64)
    err_after = np.linalg.norm(np.asarray(g2.p) - p_true, axis=1)
    assert err_after.max() < 0.2 * err_before.max(), (
        err_before.max(), err_after.max())


def test_pose_graph_caps_configurable():
    """pg_n_max/pg_e_max/pg_z_max config fields size the mapper's graph."""
    from mvil_fusion_tpu.config import GlobalMappingConfig, SystemConfig
    from mvil_fusion_tpu.mapping.global_mapping import GlobalMapper
    cfg = SystemConfig(global_mapping=GlobalMappingConfig(
        pg_n_max=64, pg_e_max=128, pg_z_max=32, check_loop_closure=False))
    gm = GlobalMapper(cfg)
    assert gm.graph.p.shape[0] == 64
    assert gm.graph.e_i.shape[0] == 128
    assert gm.graph.z_node.shape[0] == 32
    assert gm.sc_desc.shape[0] == 64
