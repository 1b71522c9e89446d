"""Per-kernel benchmark table on the current backend.

Covers every hot path of the engine against the reference's per-stage CPU
budgets (BASELINE.md): window BA ≤50 ms, scan-to-map 2×≤4 iters ≤50 ms,
VGICP with 4 OpenMP threads, tracker at 10-15 Hz.  Run:

    python benchmarks/kernels.py            # real TPU
    JAX_PLATFORMS=cpu python ...            # (CPU needs in-process force)
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def timeit(fn, n=20):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rows = []

    # ---- KLT tracker, one full 640x480 image program (CLAHE + pyramid +
    # LK + F-RANSAC + mask/refill; reference feature_tracker.cpp:81-167)
    from mvil_fusion_tpu.frontend.feature_tracker import FeatureTracker
    from mvil_fusion_tpu.io.fixture import fixture_config
    from mvil_fusion_tpu.io.synthetic import (SyntheticTrajectory as _ST,
                                              SyntheticWorld as _SW)
    _w = _SW(traj=_ST(duration=2.0), n_landmarks=600, landmark_radius=8.0)
    _eye, _z = np.eye(3), np.zeros(3)
    imgs = [_w.render_image(0.2 + i / 30.0, _eye, _z, fx=460.0, fy=460.0,
                            cx=320.0, cy=240.0, width=640, height=480)
            for i in range(3)]
    trk = FeatureTracker(fixture_config())
    trk.process(0.15, imgs[0])
    trk.process(0.2, imgs[1])      # warm both program variants
    _tk = [0.2]

    def f_trk():
        _tk[0] += 1.0 / 30.0
        return trk.process(_tk[0], imgs[int(_tk[0] * 30) % 3])
    rows.append(("klt_tracker 640x480 (whole image)", timeit(f_trk)))

    # ---- window BA fused frame step
    from mvil_fusion_tpu.estimator import ba, factors as fac
    from mvil_fusion_tpu.estimator import lidar_factors as lfac, vio
    from mvil_fusion_tpu.ops import preintegration as pre
    from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
    from helpers import build_window_problem, perturb_state

    world = SyntheticWorld(
        traj=SyntheticTrajectory(duration=4.0, w_amp=(0.9, 0.8, 1.0),
                                 w_freq=(0.5, 0.4, 0.6)),
        landmark_radius=8.0)
    W, F = 7, 128
    s_true, feats, preints, imask, times = build_window_problem(
        world, t0=1.0, W=W, F=F)
    s0 = perturb_state(s_true, np.random.default_rng(0))
    accs = np.zeros((W - 1, vio.IMU_NMAX, 3), np.float32)
    gyrs = np.zeros((W - 1, vio.IMU_NMAX, 3), np.float32)
    dts = np.zeros((W - 1, vio.IMU_NMAX), np.float32)
    masks = np.zeros((W - 1, vio.IMU_NMAX), bool)
    for k in range(W - 1):
        a, g, dt, _ = world.traj.imu_sequence(times[k], times[k + 1], 200.0)
        n = len(a)
        accs[k, :n], gyrs[k, :n], dts[k, :n] = a, g, dt
        masks[k, :n] = True
    nc = pre.noise_covariance(0.02, 0.005, 0.006, 0.0008)
    args = (s0, feats, jnp.zeros((F,), bool), jnp.asarray(accs),
            jnp.asarray(gyrs), jnp.asarray(dts), jnp.asarray(masks),
            fac.empty_prior(W, F), jnp.asarray([0, 0, 9.795], jnp.float32),
            nc, lfac.empty_icp(), lfac.empty_lps(), jnp.asarray(False),
            ba.make_fix_mask(W))
    rows.append(("vio_frame_step (preint+tri+BA8+marg)", timeit(
        lambda: vio._frame_step_jit(*args, focal=460.0, iters=8,
                                    marg_old=True))))

    # ---- preintegration alone (6 intervals x 256 samples)
    f_pre = jax.jit(lambda: pre.preintegrate_batch(
        jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
        s0.ba[:-1], s0.bg[:-1], nc, jnp.asarray(masks)))
    rows.append(("imu_preintegration x6", timeit(f_pre)))

    # ---- VGICP scan-to-scan
    from mvil_fusion_tpu.io.synthetic_lidar import BoxWorld, simulate_sweep
    from mvil_fusion_tpu.ops import deskew, vgicp, voxel
    from mvil_fusion_tpu.utils import lie
    box = BoxWorld()
    s1 = simulate_sweep(box, world.traj, 1.0, n_azimuth=900)
    s2 = simulate_sweep(box, world.traj, 1.2, n_azimuth=900)

    def dsk(s):
        p0, q0 = world.traj.pose_at(s["t_start"])
        p1, q1 = world.traj.pose_at(s["t_end"])
        return deskew.deskew_to_end(
            jnp.asarray(s["pts"]), jnp.asarray(s["rel_time"]),
            jnp.asarray(p0, jnp.float32), jnp.asarray(q0, jnp.float32),
            jnp.asarray(p1, jnp.float32), jnp.asarray(q1, jnp.float32), 0.1)

    tgt, src = dsk(s1), dsk(s2)
    tm, sm = jnp.asarray(s1["mask"]), jnp.asarray(s2["mask"])
    f_map = jax.jit(lambda: voxel.build_gaussian_voxel_map(tgt, tm, 0.5))
    rows.append(("gaussian_voxel_map (14k pts)", timeit(f_map)))
    vm_t = f_map()
    vm_s = voxel.build_gaussian_voxel_map(src, sm, 0.5)
    reg = voxel.voxel_downsample(src, sm, 0.5, 4096)
    f_icp = jax.jit(lambda: vgicp.vgicp_align(
        reg.pts, reg.mask, vm_t, vm_s, jnp.zeros(3), lie.quat_identity(),
        iters=12))
    rows.append(("vgicp_align 12 GN iters", timeit(f_icp)))

    # ---- deskew
    f_dsk = jax.jit(lambda: dsk(s2))
    rows.append(("deskew 14k pts", timeit(f_dsk)))

    # ---- LOAM scan-to-map
    from mvil_fusion_tpu.ops import loam_features as lfe, loam_icp
    grid, occ, _ = lfe.organize_grid(src, jnp.asarray(s2["ring"]),
                                  jnp.asarray(s2["rel_time"]), sm, 16, 900,
                                  0.1)
    feats_l = lfe.extract(grid, occ)
    f_feat = jax.jit(lambda: lfe.extract(grid, occ))
    rows.append(("loam_feature_extract", timeit(f_feat)))
    cmap = tgt
    f_s2m = jax.jit(lambda: loam_icp.scan_to_map(
        feats_l.sharp, feats_l.sharp_mask, feats_l.less_flat,
        feats_l.less_flat_mask, cmap, tm, cmap, tm,
        jnp.zeros(3), lie.quat_identity(), outer_iters=2, gn_iters=4))
    rows.append(("loam_scan_to_map 2x4 iters", timeit(f_s2m)))

    # ---- pose graph
    from mvil_fusion_tpu.mapping import pose_graph as pg
    from test_global_mapping import make_loop_graph
    g, _, _ = make_loop_graph()
    f_pg = jax.jit(lambda: pg.solve(g, iters=15))
    rows.append(("pose_graph 64 nodes x15 LM", timeit(f_pg)))

    # ---- ScanContext
    from mvil_fusion_tpu.ops import scancontext as sc
    pts_sc = jnp.asarray(np.random.default_rng(0).uniform(
        -30, 30, (8192, 3)).astype(np.float32))
    msk = jnp.ones(8192, bool)
    f_sc = jax.jit(lambda: sc.make_descriptor(pts_sc, msk))
    rows.append(("scancontext descriptor", timeit(f_sc)))
    d0 = f_sc()
    db = jnp.tile(d0[None], (64, 1, 1))
    keys = jnp.tile(sc.ring_key(d0)[None], (64, 1))
    f_det = jax.jit(lambda: sc.detect_loop(d0, sc.ring_key(d0), db, keys,
                                           jnp.ones(64, bool)))
    rows.append(("scancontext detect (64 db)", timeit(f_det)))

    print(f"backend: {jax.default_backend()}")
    print(f"{'kernel':<42}{'mean ms':>10}")
    for name, ms in rows:
        print(f"{name:<42}{ms:>10.2f}")


if __name__ == "__main__":
    main()
