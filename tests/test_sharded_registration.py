import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, _quat_to_mat
from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
from mvil_fusion_tpu.ops import deskew, vgicp, voxel
from mvil_fusion_tpu.parallel import mesh as mesh_lib
from mvil_fusion_tpu.parallel import sharded_registration as sreg
from mvil_fusion_tpu.utils import lie

TRAJ = SyntheticTrajectory(duration=4.0, w_amp=(0.3, 0.25, 0.6),
                           w_freq=(0.3, 0.25, 0.35),
                           p_amp=(1.0, 0.9, 0.3), p_freq=(0.3, 0.37, 0.21),
                           lin_vel=(0.6, 0.3, 0.0))


def _pair():
    box = BoxWorld()
    out = []
    for t0 in (1.0, 1.2):
        s = simulate_sweep(box, TRAJ, t0, n_azimuth=900)
        p0, q0 = TRAJ.pose_at(s["t_start"])
        p1, q1 = TRAJ.pose_at(s["t_end"])
        pts = deskew.deskew_to_end(
            jnp.asarray(s["pts"]), jnp.asarray(s["rel_time"]),
            jnp.asarray(p0, jnp.float32), jnp.asarray(q0, jnp.float32),
            jnp.asarray(p1, jnp.float32), jnp.asarray(q1, jnp.float32), 0.1)
        out.append((pts, jnp.asarray(s["mask"]), (p1, q1)))
    return out


def test_sharded_vgicp_matches_single_device():
    (tgt, tm, (pt, qt)), (src, sm, (ps, qs)) = _pair()
    Rt = _quat_to_mat(qt)
    Rs = _quat_to_mat(qs)
    R_rel = Rt.T @ Rs
    t_rel = Rt.T @ (ps - pt)

    tgt_map = voxel.build_gaussian_voxel_map(tgt, tm, 0.5)
    reg = voxel.voxel_downsample(src, sm, 0.5, 4096)
    src_map = voxel.build_gaussian_voxel_map(src, sm, 0.5)
    q0 = lie.quat_boxplus(lie.mat_to_quat(jnp.asarray(R_rel, jnp.float32)),
                          jnp.asarray([0.03, -0.02, 0.04]))
    p0 = jnp.asarray(t_rel, jnp.float32) + jnp.asarray([0.1, -0.08, 0.05])

    ref = vgicp.vgicp_align(reg.pts, reg.mask, tgt_map, src_map, p0, q0,
                            iters=10)

    m = mesh_lib.make_mesh(8)
    aligner = sreg.make_sharded_vgicp(m, iters=10)
    pts_sh, mask_sh = sreg.shard_points(m, reg.pts, reg.mask)
    res = aligner(pts_sh, mask_sh, tgt_map, src_map, p0, q0)

    np.testing.assert_allclose(np.asarray(res.p), np.asarray(ref.p),
                               atol=1e-3)
    ang = np.linalg.norm(np.asarray(lie.quat_boxminus(res.q, ref.q)))
    assert ang < 1e-3, ang
    assert abs(int(res.n_corr) - int(ref.n_corr)) <= 2
    # accuracy vs truth
    assert np.linalg.norm(np.asarray(res.p) - t_rel) < 0.06
