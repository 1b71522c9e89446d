import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.estimator.lidar_frontend import lidar_align
from mvil_fusion_tpu.frontend.lidar_compensator import LidarCompensator
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
from mvil_fusion_tpu.utils import lie


def test_lidar_align_recovers_extrinsics(rng):
    """Generate consistent body/lidar relative motions from a known
    extrinsic and recover it with the bounded joint solve."""
    q_lb_true = lie.quat_exp(jnp.asarray([0.03, -0.02, 0.05], jnp.float32))
    t_lb_true = np.asarray([0.12, -0.01, -0.13], np.float32)
    R_lb = np.asarray(lie.quat_to_mat(q_lb_true))

    n = 40
    q_b, t_b, q_l, t_l = [], [], [], []
    for _ in range(n):
        phi = rng.normal(scale=0.3, size=3).astype(np.float32)
        tb = rng.normal(scale=0.4, size=3).astype(np.float32)
        qb = lie.quat_exp(jnp.asarray(phi))
        Rb = np.asarray(lie.quat_to_mat(qb))
        # T_l = T_lb⁻¹ ∘ T_b ∘ T_lb (lidar-frame relative motion)
        Rl = R_lb.T @ Rb @ R_lb
        tl = R_lb.T @ (Rb @ t_lb_true + tb - t_lb_true)
        q_b.append(np.asarray(qb))
        t_b.append(tb)
        q_l.append(np.asarray(lie.mat_to_quat(jnp.asarray(Rl, jnp.float32))))
        t_l.append(tl.astype(np.float32))

    # reference residual convention: t rows use R_lb t_b with R_lb mapping
    # body→lidar...? verify by checking residual at truth is ~0 via solve
    q_est, t_est, ok = lidar_align(
        jnp.asarray(np.asarray(q_l)), jnp.asarray(np.asarray(t_l)),
        jnp.asarray(np.asarray(t_b)), jnp.asarray(np.asarray(q_b)),
        lie.quat_identity(),
        jnp.asarray([-0.3, -0.3, -0.3]), jnp.asarray([0.3, 0.3, 0.3]))
    assert ok
    # residual convention check: recovered transform reproduces the data
    R_est = np.asarray(lie.quat_to_mat(q_est))
    errs = []
    for k in range(n):
        Rl = np.asarray(lie.quat_to_mat(jnp.asarray(q_l[k])))
        pred_tl = (np.eye(3) - Rl) @ np.asarray(t_est) + R_est @ t_b[k]
        errs.append(np.linalg.norm(pred_tl - t_l[k]))
    assert np.mean(errs) < 0.02, np.mean(errs)


def test_lidar_compensator_annotates():
    cfg = SystemConfig()
    comp = LidarCompensator(cfg)
    traj = SyntheticTrajectory(duration=3.0)
    sweep = simulate_sweep(BoxWorld(), traj, 1.0, n_azimuth=360)
    out = comp.process(1.0, sweep["pts"], sweep["mask"])
    m = out.mask & sweep["mask"]
    assert m.sum() > 1000
    ring_err = np.abs(out.ring[m] - sweep["ring"][m])
    assert (ring_err == 0).mean() > 0.95
    # intensity encodes ring + rel_time (reference convention)
    enc_ring = np.floor(out.intensity[m]).astype(int)
    assert (enc_ring == out.ring[m]).mean() > 0.99
    rel = out.intensity[m] - enc_ring
    assert np.abs(rel - out.rel_time[m]).max() < 1e-4
    # range gating: nothing beyond max_distance or under min_distance
    r = np.linalg.norm(out.pts[out.mask], axis=1)
    assert (r > cfg.lidar.min_distance).all()
    assert (r < cfg.lidar.max_distance).all()
