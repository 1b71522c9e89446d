"""Round-2 feature tests: lz4 codec/bags, camera factory dispatch,
compensator start-orientation inference, IMU overflow decimation,
rotation-compensated keyframe parallax."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvil_fusion_tpu.config import (CameraConfig, LidarConfig, SystemConfig,
                                    EstimatorConfig, ImuConfig)
from mvil_fusion_tpu.io import lz4, rosbag as rb


# ---------------------------------------------------------------- lz4

def test_lz4_roundtrip_and_vectors():
    rng = np.random.default_rng(0)
    cases = [b"", b"x", b"ab" * 5000,
             rng.integers(0, 256, 20000, dtype=np.uint8).tobytes(),
             bytes(range(256)) * 100]
    for c in cases:
        assert lz4.decompress(lz4.compress(c)) == c
    # known xxh32 vector (seed 0, empty input)
    assert lz4.xxh32(b"") == 0x02CC5D05


def test_rosbag_lz4_chunk_roundtrip(tmp_path):
    path = str(tmp_path / "t.bag")
    w = rb.BagWriter(path, compression="lz4")
    w.add_connection("/imu", "sensor_msgs/Imu")
    for i in range(20):
        w.write("/imu", i * 0.01, rb.encode_imu(i * 0.01, [0, 0, 9.8],
                                                [0.1, 0, 0]))
    w.close()
    msgs = list(rb.BagReader(path).messages())
    assert len(msgs) == 20
    t, acc, gyr = rb.decode_imu(msgs[5].raw)
    np.testing.assert_allclose(acc, [0, 0, 9.8])
    np.testing.assert_allclose(gyr, [0.1, 0, 0])


def test_rosbag_unknown_compression_raises(tmp_path):
    from mvil_fusion_tpu.io.rosbag import _decompress_chunk
    with pytest.raises(ValueError, match="unsupported"):
        _decompress_chunk("zstd", b"xx")


# ------------------------------------------------------- camera factory

@pytest.mark.parametrize("model,extra", [
    ("pinhole", dict(k1=-0.1, k2=0.02)),
    ("mei", dict(xi=0.9, k1=0.02, k2=0.0)),
    ("equidistant", dict(k2=0.01, k3=-0.002)),
    ("scaramuzza", dict(poly=(-250.0, 0.0, 0.0008))),
])
def test_camera_factory_models_roundtrip(model, extra):
    """Every configurable model lifts+projects consistently — the tracker's
    lift path works for all four (reference CameraFactory.cc)."""
    from mvil_fusion_tpu.frontend import camera as cam
    cfg = CameraConfig(model=model, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                       **extra)
    c = cam.from_config(cfg)
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.uniform([220, 170], [420, 310], (32, 2))
                     .astype(np.float32))
    n = c.lift_projective(uv)
    pts3 = jnp.concatenate([n, jnp.ones((32, 1))], axis=1) * 3.0
    uv2 = c.space_to_plane(pts3)
    assert float(jnp.max(jnp.abs(uv2 - uv))) < 0.6


def test_camera_factory_unknown_raises():
    from mvil_fusion_tpu.frontend import camera as cam
    with pytest.raises(NotImplementedError):
        cam.from_config(CameraConfig(model="cylindrical"))


# -------------------------------------------- start-orientation inference

def test_start_orientation_inference():
    """Sweeps whose first point is at azimuth≠0 get rel_time measured from
    the inferred start, not from azimuth 0 (reference PointProcessor
    start-ori circular buffers)."""
    from mvil_fusion_tpu.frontend.lidar_compensator import LidarCompensator
    cfg = SystemConfig(lidar=LidarConfig(infer_start_ori=True))
    comp = LidarCompensator(cfg)
    start = 2.1                      # true sweep start azimuth (rad)
    n = 720
    azi = start - np.linspace(0, 2 * np.pi, n, endpoint=False)  # clockwise
    elev = np.zeros(n)
    pts = 5.0 * np.stack([np.cos(azi), np.sin(azi), elev], axis=1)
    for _ in range(3):               # let the history converge
        sweep = comp.process(0.0, pts.astype(np.float32))
    rel = sweep.rel_time[sweep.mask]
    # first emitted points (at the true start) get rel_time ≈ 0, and
    # rel_time increases monotonically with emission order
    assert rel[0] < 0.005
    assert rel[-1] > 0.09
    assert np.all(np.diff(rel) > -1e-6)

    # without inference, the same sweep is mis-timed (starts mid-sweep)
    cfg0 = SystemConfig(lidar=LidarConfig(infer_start_ori=False))
    sweep0 = LidarCompensator(cfg0).process(0.0, pts.astype(np.float32))
    assert sweep0.rel_time[sweep0.mask][0] > 0.005


# ------------------------------------------------ IMU overflow decimation

def test_imu_interval_decimation_preserves_span():
    from mvil_fusion_tpu.estimator.vio import ImuInterval, _decimate_interval
    n = 500
    ts = np.linspace(0.0, 2.5, n)
    iv = ImuInterval(acc=[np.asarray([0.1 * t, 0, 9.8]) for t in ts],
                     gyr=[np.asarray([0, 0.2 * t, 0]) for t in ts],
                     t=list(ts))
    out = _decimate_interval(iv, 64)
    assert len(out.t) <= 64
    assert out.t[0] == ts[0] and out.t[-1] == ts[-1]
    # total integration time preserved
    assert abs(sum(np.diff(out.t)) - (ts[-1] - ts[0])) < 1e-9


def test_estimator_decimates_oversized_interval():
    """Merged non-keyframe intervals past the device capacity are decimated
    (bounded error), never silently truncated (VERDICT weak #2)."""
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    cfg = SystemConfig(imu=ImuConfig(max_imu_per_frame=32))
    est = VIOEstimator(cfg)
    assert est.imu_nmax == 32
    # simulate one interval with 200 samples (e.g. after repeated merges)
    t0 = 0.0
    for k in range(200):
        est.process_imu(t0 + k * 0.005, np.asarray([0, 0, 9.795]),
                        np.zeros(3))
    est.process_features(0.0, np.asarray([0]), np.zeros((1, 2), np.float32),
                         np.zeros((1, 2), np.float32))
    for k in range(200):
        est.process_imu(1.0 + k * 0.005, np.asarray([0, 0, 9.795]),
                        np.zeros(3))
    est.process_features(1.999, np.asarray([0]),
                         np.zeros((1, 2), np.float32),
                         np.zeros((1, 2), np.float32))
    accs, gyrs, dts, masks = est._imu_buffers()
    assert est.imu_decimations >= 1
    # the interval between the two frames covers both bursts (0→1.995 s);
    # that span survives decimation down to 32 slots
    assert int(masks[0].sum()) <= 32
    assert abs(float(dts[0].sum()) - 1.995) < 0.02


# --------------------------------------------- global-mapper robustness

def _simple_submap(k, z=0.0, n_pts=800, seed=0):
    from mvil_fusion_tpu.mapping.local_mapping import Submap
    rng = np.random.default_rng(seed + k)
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    r = rng.uniform(3.0, 12.0, n_pts)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang),
                    rng.uniform(-1, 1, n_pts)], axis=1).astype(np.float32)
    p = np.asarray([2.0 * k, 0.0, z], np.float32)
    q = np.asarray([1.0, 0, 0, 0], np.float32)
    return Submap(t=float(k), p_w=p, q_w=q, pts=pts, odom_p=p, odom_q=q)


def test_pose_graph_capacity_evicts(monkeypatch):
    """At N_MAX the mapper evicts the oldest quarter instead of asserting
    (VERDICT weak #8); indices, edges and ScanContext slots stay aligned."""
    from mvil_fusion_tpu.mapping import global_mapping as gmap
    from mvil_fusion_tpu.config import GlobalMappingConfig, SystemConfig
    monkeypatch.setattr(gmap, "N_MAX", 8)
    cfg = SystemConfig(global_mapping=GlobalMappingConfig(
        check_loop_closure=False))
    gm = gmap.GlobalMapper(cfg)
    for k in range(12):
        info = gm.add_submap(_simple_submap(k))
        assert np.isfinite(info["p"]).all()
    assert gm.n_nodes <= 8
    traj = gm.trajectory()
    # the surviving nodes are the most recent ones, in order
    times = [t for t, _, _ in traj]
    assert times == sorted(times) and times[-1] == 11.0
    assert len(gm.scans) == gm.n_nodes == len(gm.times)
    assert gm.n_edges >= gm.n_nodes - 1 - 2  # chain minus evicted links


def test_z_jump_triggers_graph_refresh():
    """A >0.5 m z jump between consecutive keyed poses re-solves the graph
    (the reference's ikd-tree rebuild trigger,
    globalMappingIkdTree.cpp:290-298)."""
    from mvil_fusion_tpu.mapping import global_mapping as gmap
    from mvil_fusion_tpu.config import GlobalMappingConfig, SystemConfig
    cfg = SystemConfig(global_mapping=GlobalMappingConfig(
        check_loop_closure=False))
    gm = gmap.GlobalMapper(cfg)
    for k in range(3):
        gm.add_submap(_simple_submap(k))
    assert gm.map_refreshes == 0
    gm.add_submap(_simple_submap(3, z=3.0))   # floor transition
    assert gm.map_refreshes == 1


# ------------------------------------------------ ex_results stream

def test_ex_results_row_shape():
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    est = VIOEstimator(SystemConfig())
    est._record_ex_results(1.25)
    t, vi_ypr, vi_t, li_ypr, li_t, td = est.ex_results[0]
    assert t == 1.25
    assert vi_ypr.shape == (3,) and li_t.shape == (3,)
    assert isinstance(td, float)


# ------------------------------------- rotation-compensated parallax

def _feed_rotation_only(est, w_z=0.6, n_frames=6, n_feats=60, fps=10.0):
    """Pure-rotation camera stream: features move in the image purely from
    yaw rotation; gyro reports the same rotation."""
    rng = np.random.default_rng(3)
    # far landmarks on a cylinder (parallax-free under rotation)
    ang = rng.uniform(-0.5, 0.5, n_feats)
    h = rng.uniform(-0.3, 0.3, n_feats)
    for k in range(n_frames):
        t = k / fps
        yaw = w_z * t
        # IMU at 100 Hz with constant yaw rate
        if k > 0:
            for i in range(10):
                # pan about the camera's y axis (ric = I): horizontal
                # image motion matches rotation about +y of the frame
                # with x right / y down / z forward
                est.process_imu((k - 1) / fps + (i + 1) * 0.01,
                                np.asarray([0, 0, 9.795]),
                                np.asarray([0.0, w_z, 0.0]))
        # bearing in camera frame after rotating by yaw (camera z forward,
        # x right: rotate bearing azimuth by -yaw)
        a = ang - yaw
        norm = np.stack([np.tan(a), h], axis=1).astype(np.float32)
        vis = np.abs(a) < 0.45
        est.process_features(t, np.nonzero(vis)[0],
                             norm[vis], np.zeros((vis.sum(), 2), np.float32))
    return est


def test_pure_rotation_yields_second_new_marginalization():
    """Under pure rotation the compensated parallax stays ~0, so the
    keyframe decision flips to marginalize-second-new (reference
    compensatedParallax2); the uncompensated displacement alone would have
    declared keyframes."""
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    cfg = SystemConfig(estimator=EstimatorConfig(
        ric=(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0), tic=(0.0, 0.0, 0.0),
        td_init=0.0, estimate_extrinsic=0, estimate_td=False))
    est = _feed_rotation_only(VIOEstimator(cfg))
    # raw displacement is large (rotation moves the image a lot)…
    k = est.frame_count
    tr = next(t for t in est.tracks.values()
              if k - 1 in t.obs and k - 2 in t.obs)
    raw = np.linalg.norm(tr.obs[k - 1].norm - tr.obs[k - 2].norm)
    assert raw > 0.02
    # …but the gyro-compensated keyframe decision says "not a keyframe"
    assert est.marg_old is False


# ------------------------------------------- IMU timestamp disorder guard

def test_imu_disorder_rejected():
    """Out-of-order IMU samples are dropped with one warning (reference
    estimator_node.cpp:238-242) — no negative dt may reach preintegration."""
    import warnings
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    est = VIOEstimator(SystemConfig())
    est.process_imu(0.00, np.zeros(3), np.zeros(3))
    est.process_imu(0.01, np.zeros(3), np.zeros(3))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        est.process_imu(0.005, np.ones(3), np.ones(3))   # disordered
        est.process_imu(0.010, np.ones(3), np.ones(3))   # duplicate stamp
    assert est.imu_disorder == 2
    assert len([x for x in w if "disorder" in str(x.message)]) == 1
    est.process_imu(0.02, np.zeros(3), np.zeros(3))
    ts = np.asarray(est._pending.t)
    assert np.all(np.diff(ts) > 0), ts
    # downstream dt construction sees no negatives
    assert len(est._pending.t) == 3


def test_imu_disorder_no_nan_in_window():
    """A disordered stream mid-run must not corrupt the window: feed a
    shuffled burst and check the interval buffers stay monotonic."""
    from mvil_fusion_tpu.estimator.vio import VIOEstimator
    est = VIOEstimator(SystemConfig())
    rng = np.random.default_rng(3)
    ts = np.sort(rng.uniform(0, 1.0, 200))
    shuffled = ts.copy()
    shuffled[50:60] = shuffled[50:60][::-1]           # a disordered burst
    for t in shuffled:
        est.process_imu(t, rng.normal(0, 1, 3), rng.normal(0, 0.1, 3))
    kept = np.asarray(est._pending.t)
    assert np.all(np.diff(kept) > 0)
    assert est.imu_disorder > 0


# ------------------------------------------- non-uniform (hdl64) ring table

def test_hdl64_two_section_ring_table():
    """Synthetic two-section check: points emitted exactly at each HDL-64
    laser elevation must map to their own ring (the linear ladder mis-bins
    the 1/3°-spaced upper block; reference PointProcessor.h:77-81)."""
    from mvil_fusion_tpu.frontend.lidar_compensator import (
        LidarCompensator, SENSOR_ELEV_TABLES)
    tab = SENSOR_ELEV_TABLES["hdl64"]
    assert len(tab) == 64 and np.all(np.diff(tab) > 0)
    # two sections: upper spacing ~1/3 deg, lower ~1/2 deg
    lower_gap = np.diff(tab[:32]).mean()
    upper_gap = np.diff(tab[32:]).mean()
    assert 0.45 < lower_gap < 0.55
    assert 0.30 < upper_gap < 0.37

    cfg = SystemConfig(lidar=LidarConfig(infer_start_ori=False))
    comp = LidarCompensator(cfg, sensor="hdl64")
    azi = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    elev = np.deg2rad(tab)
    pts = 10.0 * np.stack([np.cos(elev) * np.cos(azi),
                           np.cos(elev) * np.sin(azi),
                           np.sin(elev)], axis=1)
    sweep = comp.process(0.0, pts.astype(np.float32))
    assert sweep.mask.all()
    assert np.array_equal(np.asarray(sweep.ring), np.arange(64))

    # a point well below the bottom laser is rejected, not mis-binned
    stray_elev = np.deg2rad(tab[0] - 1.0)
    stray = 10.0 * np.asarray([[np.cos(stray_elev), 0.0, np.sin(stray_elev)]])
    sw2 = comp.process(0.0, stray.astype(np.float32))
    assert not sw2.mask.any()


def test_linear_ladder_unchanged_for_16ring():
    """The released 16-ring sensor keeps the linear ladder (regression)."""
    from mvil_fusion_tpu.frontend.lidar_compensator import LidarCompensator
    cfg = SystemConfig(lidar=LidarConfig(infer_start_ori=False))
    comp = LidarCompensator(cfg)    # leishen_c16
    elev = np.deg2rad(np.linspace(-15, 15, 16))
    pts = 5.0 * np.stack([np.cos(elev), np.zeros(16), np.sin(elev)], axis=1)
    sweep = comp.process(0.0, pts.astype(np.float32))
    assert np.array_equal(np.asarray(sweep.ring), np.arange(16))


# ---------------------------------------------------- lz4 corrupt-input guard

def test_lz4_corrupt_block_rejected_before_copy():
    """A crafted block declaring a huge match length must raise (bounded by
    max_size) BEFORE growing the output, and truncated literal runs raise
    instead of silently clamping."""
    # token: 0 literals, match_len token 15 -> extended bytes: declare ~4 GiB
    crafted = bytes([0x0F, 0x01, 0x00]) + b"\xff" * 2000 + b"\x00"
    with pytest.raises(ValueError):
        lz4.decompress_block(b"\x10A" + crafted, max_size=1 << 16)
    # literal run longer than the remaining source
    with pytest.raises(ValueError, match="literal run"):
        lz4.decompress_block(bytes([0xF0, 200]) + b"ab", max_size=1 << 16)
    # truncated length-extension bytes
    with pytest.raises(ValueError, match="truncated"):
        lz4.decompress_block(bytes([0xF0]) + b"\xff" * 3)


def test_feature_ids_bitcast_exact_for_large_ids():
    """Published ids survive the packed f32 readback exactly even past
    2^24 (bitcast, not value cast)."""
    from mvil_fusion_tpu.frontend.feature_tracker import FeatureTracker
    cfg = SystemConfig()
    tr = FeatureTracker(cfg)
    tr.next_id = jnp.asarray(2 ** 24 + 3, jnp.int32)  # would collide as f32
    img = (np.random.default_rng(0).uniform(0, 255, (cfg.camera.height,
                                                     cfg.camera.width))
           .astype(np.float32))
    frame = tr.process(0.0, img)
    assert frame is not None
    got = np.sort(frame.ids[frame.valid])
    assert got[0] >= 2 ** 24 + 3
    assert len(np.unique(got)) == len(got)          # no collisions
    # consecutive spawn ids — exact int round-trip
    assert np.array_equal(got, np.arange(got[0], got[0] + len(got)))
