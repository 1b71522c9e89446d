"""Per-kernel benchmark table with roofline/MFU accounting.

Covers every hot path of the engine against the reference's per-stage CPU
budgets (BASELINE.md): window BA ≤50 ms, scan-to-map 2×≤4 iters ≤50 ms,
VGICP with 4 OpenMP threads, tracker at 10-15 Hz.  For each kernel:

  wall ms   — mean blocking-call latency (dispatch + queue + execute);
              on the tunneled chip this includes the ~45 ms RTT
  dev ms    — amortized per-call time of 8 back-to-back async enqueues
              (dispatch overlaps, so this approximates device time)
  GFLOP/s   — analytic XLA flop estimate / dev-time
              (jax .compile().cost_analysis())
  %peak     — fraction of the backend's matmul peak
  verdict   — dispatch-bound / bandwidth-bound / compute-bound, from the
              roofline position at dev-time (SURVEY.md §7 step 7)

Run:
    python benchmarks/kernels.py            # real TPU
    JAX_PLATFORMS=cpu python ...            # (CPU needs in-process force)
"""

import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize overrides the env var; force in-process
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

# v5e: 197 TFLOP/s bf16 MXU peak (f32 passes cost ~3x), 819 GB/s HBM.
# CPU numbers are rough single-socket figures — only the verdict matters.
PEAKS = {
    "tpu": (197e12, 819e9),
    "cpu": (2e11, 5e10),
}


def timeit(fn, n=20):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def timeit_pipelined(fn, n=8):
    """Per-call time of n back-to-back ASYNC enqueues: dispatch overlaps
    execution, so this approximates pure device time per call."""
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1000.0


def cost_analysis(jit_fn, *args, **kwargs):
    """(flops, bytes) from the compiled executable, or (None, None)."""
    try:
        c = jit_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return (float(c.get("flops", 0.0)),
                float(c.get("bytes accessed", 0.0)))
    except Exception:
        return None, None


def classify(wall_ms, dev_ms, flops, byts, peak_flops, peak_bw):
    """Roofline verdict at device time."""
    if flops is None or dev_ms is None or dev_ms <= 0:
        return "", "", ""
    dev_s = dev_ms / 1e3
    gflops = flops / dev_s / 1e9
    pk = flops / dev_s / peak_flops
    bw = byts / dev_s / peak_bw
    if dev_ms < 0.25 * wall_ms:
        verdict = "dispatch-bound"
    elif pk >= bw:
        verdict = f"compute-bound ({pk:.0%} peak)"
    else:
        verdict = f"bandwidth-bound ({bw:.0%} HBM)"
    return f"{gflops:.0f}", f"{pk * 100:.2f}", verdict


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    peak_flops, peak_bw = PEAKS.get(
        "tpu" if backend not in ("cpu",) else "cpu", PEAKS["cpu"])
    rows = []

    def add(name, fn, jit_fn=None, cost_args=(), cost_kwargs=None,
            pipelined=True):
        wall = timeit(fn)
        dev = timeit_pipelined(fn) if pipelined else None
        flops = byts = None
        if jit_fn is not None:
            flops, byts = cost_analysis(jit_fn, *cost_args,
                                        **(cost_kwargs or {}))
        rows.append((name, wall, dev, flops, byts))

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
        # device-only step (the publish fetch is deferred in production)
        return trk.process_device(_tk[0], imgs[int(_tk[0] * 30) % 3])[1]
    add("klt_tracker 640x480 (whole image)", f_trk)

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
    step_kw = dict(focal=460.0, iters=8, marg_old=True)
    add("vio_frame_step (preint+tri+BA8+marg)",
        lambda: vio._frame_step_jit(*args, **step_kw),
        jit_fn=vio._frame_step_jit, cost_args=args, cost_kwargs=step_kw)

    # ---- preintegration alone (6 intervals x 256 samples)
    f_pre = jax.jit(lambda: pre.preintegrate_batch(
        jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
        s0.ba[:-1], s0.bg[:-1], nc, jnp.asarray(masks)))
    add("imu_preintegration x6", f_pre, jit_fn=f_pre)

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
    TBL = 1 << 16      # production table size (LidarConfig.vgicp_table_size)
    f_map = jax.jit(lambda: voxel.build_gaussian_voxel_map(
        tgt, tm, 0.5, table_size=TBL))
    add("gaussian_voxel_map (14k pts, 2^16)", f_map, jit_fn=f_map)
    vm_t = f_map()
    vm_s = voxel.build_gaussian_voxel_map(src, sm, 0.5, table_size=TBL)
    reg = voxel.voxel_downsample(src, sm, 0.5, 4096, table_size=TBL)
    f_icp = jax.jit(lambda: vgicp.vgicp_align(
        reg.pts, reg.mask, vm_t, vm_s, jnp.zeros(3), lie.quat_identity(),
        iters=12))
    add("vgicp_align 12 GN iters", f_icp, jit_fn=f_icp)

    # ---- deskew
    f_dsk = jax.jit(lambda: dsk(s2))
    add("deskew 14k pts", f_dsk, jit_fn=f_dsk)

    # ---- LOAM scan-to-map
    from mvil_fusion_tpu.ops import loam_features as lfe, loam_icp
    grid, occ, _ = lfe.organize_grid(src, jnp.asarray(s2["ring"]),
                                  jnp.asarray(s2["rel_time"]), sm, 16, 900,
                                  0.1)
    feats_l = lfe.extract(grid, occ)
    f_feat = jax.jit(lambda: lfe.extract(grid, occ))
    add("loam_feature_extract", f_feat, jit_fn=f_feat)
    cmap = tgt
    f_s2m = jax.jit(lambda: loam_icp.scan_to_map(
        feats_l.sharp, feats_l.sharp_mask, feats_l.less_flat,
        feats_l.less_flat_mask, cmap, tm, cmap, tm,
        jnp.zeros(3), lie.quat_identity(), outer_iters=2, gn_iters=4))
    add("loam_scan_to_map 2x4 iters", f_s2m, jit_fn=f_s2m)

    # ---- pose graph: small dense + full-capacity CG
    from mvil_fusion_tpu.mapping import pose_graph as pg
    from test_global_mapping import make_loop_graph
    g, _, _ = make_loop_graph()
    f_pg = jax.jit(lambda: pg.solve(g, iters=15))
    add("pose_graph dense 64 nodes x15 LM", f_pg, jit_fn=f_pg)

    rngpg = np.random.default_rng(7)
    Npg, Epg = 512, 2048
    gb = pg.empty_graph(Npg, Epg, 64)
    th = np.linspace(0, 8 * np.pi, Npg)
    p_true = np.stack([10 * np.cos(th), 10 * np.sin(th),
                       np.linspace(0, 12, Npg)], 1).astype(np.float32)
    e_i = np.concatenate([np.arange(Npg - 1),
                          rngpg.integers(0, Npg - 1, Epg - (Npg - 1))])
    e_j = np.concatenate([np.arange(1, Npg),
                          np.minimum(e_i[Npg - 1:] + rngpg.integers(
                              1, 40, Epg - (Npg - 1)), Npg - 1)])
    gb = gb._replace(
        p=jnp.asarray(p_true + rngpg.normal(scale=0.3,
                                            size=p_true.shape)
                      .astype(np.float32)),
        node_mask=gb.node_mask.at[:].set(True),
        e_i=jnp.asarray(e_i.astype(np.int32)),
        e_j=jnp.asarray(e_j.astype(np.int32)),
        e_dp=jnp.asarray(p_true[e_j] - p_true[e_i]),
        e_w=jnp.full((Epg,), 10.0, jnp.float32),
        e_mask=jnp.asarray(e_i != e_j))
    f_pgcg = jax.jit(lambda: pg.solve_cg(gb, iters=8, cg_iters=64))
    add("pose_graph CG 512n/2048e x8 LM", f_pgcg, jit_fn=f_pgcg)

    # ---- ScanContext
    from mvil_fusion_tpu.ops import scancontext as sc
    pts_sc = jnp.asarray(np.random.default_rng(0).uniform(
        -30, 30, (8192, 3)).astype(np.float32))
    msk = jnp.ones(8192, bool)
    f_sc = jax.jit(lambda: sc.make_descriptor(pts_sc, msk))
    add("scancontext descriptor", f_sc, jit_fn=f_sc)
    d0 = f_sc()
    db = jnp.tile(d0[None], (64, 1, 1))
    keys = jnp.tile(sc.ring_key(d0)[None], (64, 1))
    f_det = jax.jit(lambda: sc.detect_loop(d0, sc.ring_key(d0), db, keys,
                                           jnp.ones(64, bool)))
    add("scancontext detect (64 db)", f_det, jit_fn=f_det)

    print(f"backend: {backend} "
          f"(peaks: {peak_flops / 1e12:.0f} TFLOP/s, "
          f"{peak_bw / 1e9:.0f} GB/s)")
    hdr = (f"{'kernel':<40}{'wall ms':>9}{'dev ms':>9}"
           f"{'GFLOP/s':>9}{'%peak':>7}  verdict")
    print(hdr)
    for name, wall, dev, flops, byts in rows:
        gf, pk, verdict = classify(wall, dev, flops, byts,
                                   peak_flops, peak_bw)
        dev_s = f"{dev:.2f}" if dev is not None else "-"
        print(f"{name:<40}{wall:>9.2f}{dev_s:>9}{gf:>9}{pk:>7}  {verdict}")


if __name__ == "__main__":
    main()
