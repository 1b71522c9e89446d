"""Offline runner e2e: fixture bag → `python -m mvil_fusion_tpu.run` →
trajectory files + ATE (the reference's `roslaunch + rosbag play` workflow,
README.md:44-57).  The bag uses real sensor_msgs encodings and lz4 chunk
compression, so this also covers the reader's lz4 path end-to-end.

The whole ladder: bag → KLT tracker on rendered images → VIO with lidar
constraints → LOAM local mapping → global pose graph → TUM files → ATE."""

import dataclasses
import json
import os

import numpy as np
import pytest

from mvil_fusion_tpu.config import (EstimatorConfig, LidarConfig,
                                    LocalMappingConfig, TrackerConfig)
from mvil_fusion_tpu.io.fixture import fixture_config, record_fixture_bag

pytestmark = pytest.mark.slow  # full e2e ladder; fast subset: -m 'not slow'

def small_cfg():
    # full 640x480 / 460-focal rig (tracking accuracy needs the real
    # resolution) with reduced landmark slots and lidar iterations so the
    # CPU ladder stays affordable
    base = fixture_config()
    return base.replace(
        tracker=TrackerConfig(max_cnt=100, min_dist=25, freq=10,
                              max_features_pad=128),
        estimator=dataclasses.replace(base.estimator, max_features=128),
        lidar=dataclasses.replace(base.lidar, vgicp_iters=8),
        local_mapping=LocalMappingConfig(submap_trigger_dist=1.0,
                                         submap_trigger_frames=10))


@pytest.fixture(scope="module")
def small_bag(tmp_path_factory):
    d = tmp_path_factory.mktemp("bag")
    bag = str(d / "fixture.bag")
    gt = str(d / "gt_tum.txt")
    cfgp = str(d / "cfg.json")
    record_fixture_bag(bag, duration=6.0, image_hz=20.0, lidar_hz=5.0,
                       n_azimuth=360, compression="lz4", gt_path=gt)
    json.dump(small_cfg().to_dict(), open(cfgp, "w"))
    return bag, gt, cfgp


def _check(result, out_prefix, ate_gate=0.3):
    assert result["failures"] == 0
    assert result["frontend_poses"] > 25
    assert result["midend_poses"] >= 3
    # Gates recalibrated in round 4: the scale-observability init gate +
    # per-solve gauge re-anchor + Cauchy-robust LPS/ICP rows cut this
    # bag's frontend ATE from ~0.35 m (round 3) to ~0.06 m and eliminated
    # the post-init |ba| transient (2.0-3.5 m/s² -> 0.4) that used to trip
    # failureDetection.  With a near-exact VIO the mapping stages can no
    # longer IMPROVE on it on a 6 s bag (they add their own 5-10 cm), so
    # the old strictly-decreasing ladder is replaced by an absolute
    # downstream bound; the hard-fixture ledger still pins the full
    # multi-stage improvement chain at scale.
    assert result["ate_frontend_m"] < ate_gate, result
    assert result["ate_midend_m"] < max(2.0 * result["ate_frontend_m"],
                                        0.35), result
    if result.get("backend_poses", 0) >= 3:
        assert result["ate_backend_m"] < max(2.0 * result["ate_midend_m"],
                                             0.35), result
    for name in ("Frontend.txt", "Midend.txt", "ex_results.txt"):
        path = out_prefix + name
        assert os.path.exists(path)
        assert len(open(path).readlines()) >= 1
    # ex_results rows: t + 13 numbers
    row = open(out_prefix + "ex_results.txt").readline().split()
    assert len(row) == 14


def test_runner_sync(small_bag, tmp_path):
    from mvil_fusion_tpu import run as runner
    bag, gt, cfgp = small_bag
    out = str(tmp_path) + "/sync_"
    result = runner.main(["--bag", bag, "--config", cfgp, "--out", out,
                          "--golden", gt, "--save-map"])
    _check(result, out)
    # map artifact (reference Map.pcd, globalMappingIkdTree.cpp:118-131)
    assert "mapping" in result
    assert result["mapping"]["nodes"] >= 1
    assert result["map_points"] > 100
    m = np.load(out + "Map.npz")["points"]
    assert m.shape[1] == 3 and len(m) == result["map_points"]
    assert np.isfinite(m).all()
    pcd = open(out + "Map.pcd").read().splitlines()
    assert pcd[1] == "VERSION 0.7"
    assert int([ln for ln in pcd if ln.startswith("POINTS")][0].split()[1]) \
        == result["map_points"]


def test_runner_threaded(small_bag, tmp_path):
    """Same ladder through the async 3-stage pipeline (the reference's
    concurrent node graph, estimator_node.cpp:552-559)."""
    from mvil_fusion_tpu import run as runner
    bag, gt, cfgp = small_bag
    out = str(tmp_path) + "/thr_"
    result = runner.main(["--bag", bag, "--config", cfgp, "--out", out,
                          "--golden", gt, "--threaded"])
    # threaded: LPS arrival timing + load shedding add frontend noise
    _check(result, out, ate_gate=0.7)
