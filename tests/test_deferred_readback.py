"""Deferred-readback equivalence: the async pipeline's one-event-lag
packed fetches (copy_to_host_async + harvest at the next event) must
produce EXACTLY the same estimates as the synchronous fetch path — only
the timing of the host-visible bookkeeping shifts.  This pins the round-3
throughput architecture against silent semantic drift."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_vio_e2e import (align_umeyama_4dof, make_cfg, make_world,
                                run_sequence)


def _run(defer: bool):
    world = make_world(duration=9.0)
    cfg = make_cfg()
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    import tests.test_vio_e2e as h

    rngseed = 0
    est = None

    # reuse the harness but toggle defer before the stream starts
    import types
    orig_init = VIOEstimator.__init__

    est, gt = None, None

    def run():
        nonlocal est, gt
        rng = np.random.default_rng(rngseed)
        est = VIOEstimator(cfg)
        est.defer_readback = defer
        traj = world.traj
        frame_times = np.arange(0.5, 7.5, 0.1)
        ric, tic = np.eye(3), np.zeros(3)
        gt = []
        prev_norm, prev_t = {}, None
        for fi, t in enumerate(frame_times):
            t_prev = frame_times[fi - 1] if fi > 0 else t - 0.1
            acc, gyr, dts, ts = traj.imu_sequence(
                max(t_prev, 0.0) + 1e-9, t, 200.0,
                noise_acc=cfg.imu.acc_n, noise_gyr=cfg.imu.gyr_n, rng=rng)
            for k in range(len(ts)):
                est.process_imu(ts[k], acc[k], gyr[k])
            uv, norm, z, vis = world.project(t, ric, tic)
            ids = np.nonzero(vis)[0][:150]
            n = norm[ids] + rng.normal(scale=0.3 / 460.0,
                                       size=(len(ids), 2))
            vel = np.zeros((len(ids), 2), np.float32)
            if prev_t is not None:
                dt = t - prev_t
                for j, fid in enumerate(ids):
                    if fid in prev_norm:
                        vel[j] = (n[j] - prev_norm[fid]) / dt
            prev_norm = {fid: n[j] for j, fid in enumerate(ids)}
            prev_t = t
            est.process_features(t, ids, n.astype(np.float32), vel)
            p_gt, q_gt, v_gt = traj.state_at(t)
            gt.append((t, p_gt, q_gt, v_gt))
        est.flush()
        return est, gt

    return run()


@pytest.mark.slow
def test_deferred_equals_sync_vio():
    est_s, gt = _run(defer=False)
    est_d, _ = _run(defer=True)
    traj_s = est_s.trajectory
    traj_d = est_d.trajectory
    assert len(traj_s) == len(traj_d) > 20
    for (ts, ps, qs, vs), (td_, pd, qd, vd) in zip(traj_s, traj_d):
        assert ts == td_
        np.testing.assert_allclose(ps, pd, atol=1e-5)
        np.testing.assert_allclose(vs, vd, atol=1e-5)
    # the deferred run is still accurate in absolute terms
    ate, _ = align_umeyama_4dof(traj_d, gt)
    assert ate < 0.3, ate
    # ex_results rows match too (flush drained the pending pack)
    assert len(est_s.ex_results) == len(est_d.ex_results)


def test_deferred_tracker_frames_match_sync():
    """FeatureTracker deferred publish returns the identical frames one
    image later."""
    import jax
    from mvil_fusion_tpu.config import SystemConfig
    from mvil_fusion_tpu.frontend.feature_tracker import FeatureTracker

    cfg = SystemConfig()
    rng = np.random.default_rng(1)
    imgs = [rng.uniform(0, 255, (cfg.camera.height, cfg.camera.width))
            .astype(np.float32)]
    for k in range(4):
        imgs.append(np.roll(imgs[-1], 3, axis=1))
    ts = [0.0, 0.15, 0.3, 0.45, 0.6]

    sync = FeatureTracker(cfg)
    frames_sync = [sync.process(t, im) for t, im in zip(ts, imgs)]

    deferred = FeatureTracker(cfg)
    pending = []
    frames_def = []
    for t, im in zip(ts, imgs):
        publish, out = deferred.process_device(t, im)
        if pending:
            tp, packed = pending.pop()
            frames_def.append(
                deferred.publish_from_packed(tp, np.asarray(packed)))
        if publish:
            try:
                out.packed.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((t, out.packed))
    if pending:
        tp, packed = pending.pop()
        frames_def.append(
            deferred.publish_from_packed(tp, np.asarray(packed)))

    frames_sync = [f for f in frames_sync if f is not None]
    assert len(frames_sync) == len(frames_def)
    for fs, fd in zip(frames_sync, frames_def):
        assert fs.t == fd.t
        np.testing.assert_array_equal(fs.ids, fd.ids)
        np.testing.assert_array_equal(fs.valid, fd.valid)
        np.testing.assert_allclose(fs.norm, fd.norm, atol=1e-7)


def test_flush_sentinel_through_pipeline():
    """('flush', t, ()) drains every stage's pending state without error
    in the threaded pipeline."""
    from mvil_fusion_tpu.io.fixture import fixture_config
    from mvil_fusion_tpu.pipeline.async_system import build_pipeline
    from mvil_fusion_tpu.pipeline.system import VilSystem

    system = VilSystem(fixture_config(), use_tracker=False,
                       enable_mapping=True)
    pipe = build_pipeline(system, deterministic=False)
    assert system.estimator.defer_readback
    pipe.start()
    try:
        for k in range(20):
            pipe.feed(("imu", k * 0.005,
                       (np.asarray([0, 0, 9.795]), np.zeros(3))))
        pipe.feed(("flush", 0.1, ()))
        assert pipe.quiesce(timeout=60.0)
    finally:
        pipe.stop(timeout=30.0)
    for st in pipe.stages:
        assert not st.errors, st.errors[:1]
