"""The HARD fixture regression: a 45 s multi-floor bag with exact
revisits, driven through the offline runner sync + threaded, checked
against a committed expected-metrics ledger (tests/data/
hard_fixture_expected.json).

This is the engine's stand-in for the reference's released-bag validation
(README.md:44-57) with numeric teeth: the loop machinery MUST fire
(radius + ScanContext closures, z-driven graph refreshes, capacity
eviction at the reduced caps), the backend must beat the midend on ATE
(mapping demonstrably helps), and any stage regressing >20 % vs the
ledger fails.

Regenerate the ledger after an intentional accuracy change:
    python tests/test_hard_fixture.py --regen
"""

import dataclasses
import json
import os
import pathlib

import numpy as np
import pytest

from mvil_fusion_tpu.config import (GlobalMappingConfig, LidarConfig,
                                    LocalMappingConfig, TrackerConfig)
from mvil_fusion_tpu.io.fixture import fixture_config, record_hard_fixture_bag

pytestmark = pytest.mark.slow

LEDGER = pathlib.Path(__file__).parent / "data" / "hard_fixture_expected.json"
DURATION = 45.0
LIDAR_HZ = 4.0


def hard_cfg():
    base = fixture_config()
    return base.replace(
        tracker=TrackerConfig(max_cnt=100, min_dist=25, freq=10,
                              max_features_pad=128),
        estimator=dataclasses.replace(base.estimator, max_features=128),
        lidar=dataclasses.replace(base.lidar, scan_period=1.0 / LIDAR_HZ,
                                  vgicp_iters=8),
        local_mapping=LocalMappingConfig(submap_trigger_dist=1.5,
                                         submap_trigger_frames=8),
        global_mapping=GlobalMappingConfig(
            floor_height=1.2,
            proximity_threshold=3.0,
            skip_recent_poses=8,
            sc_num_exclude_recent=8,
            poses_before_reclosing=6,
            z_refresh_jump=0.3,
            pg_n_max=20, pg_e_max=256, pg_z_max=64,
        ))


@pytest.fixture(scope="module")
def hard_bag(tmp_path_factory):
    d = tmp_path_factory.mktemp("hardbag")
    bag = str(d / "hard.bag")
    gt = str(d / "gt_tum.txt")
    cfgp = str(d / "cfg.json")
    record_hard_fixture_bag(bag, duration=DURATION, lidar_hz=LIDAR_HZ,
                            gt_path=gt)
    json.dump(hard_cfg().to_dict(), open(cfgp, "w"))
    return bag, gt, cfgp


def _run(bag, gt, cfgp, out, threaded):
    from mvil_fusion_tpu import run as runner
    argv = ["--bag", bag, "--config", cfgp, "--out", out,
            "--golden", gt, "--save-map"]
    if threaded:
        # lossless: on an underpowered CPU box the production DROP_OLDEST
        # policy sheds most sweeps (correct real-time behavior, useless
        # for an accuracy ledger) — back-pressure instead
        argv += ["--threaded", "--lossless"]
    return runner.main(argv)


def _check_ledger(result, ledger, tol: float, abs_floor: float = 0.0):
    # hard behavioral floor: the loop machinery actually fired
    m = result["mapping"]
    assert m["loops_closed"] >= ledger["loops_closed_min"], m
    assert m["evictions"] >= ledger["evictions_min"], m
    assert m["map_refreshes"] >= ledger["map_refreshes_min"], m
    assert result["failures"] == 0
    assert result["map_points"] > 1000
    # mapping helps: backend beats midend
    assert result["ate_backend_m"] < result["ate_midend_m"], result
    # accuracy ledger vs the committed baseline.  The sync run is
    # deterministic in the test environment (ledger generated under the
    # same XLA flags) so tol=1.2 catches >20% regressions; the threaded
    # run is genuinely nondeterministic (stage interleaving, load
    # shedding), so it gets a wider gate that still catches 2x breaks.
    # abs_floor: thread-schedule noise moves loop-closure timing, which
    # can multiply an absolutely-tiny backend ATE; a sub-abs_floor result
    # still demonstrates a working loop-closing backend
    for stage in ("frontend", "midend", "backend"):
        key = f"ate_{stage}_m"
        assert result[key] <= max(tol * ledger[key], abs_floor), (
            f"{key} regressed: {result[key]} vs ledger {ledger[key]}")
    # constraint modes: registration-driven modes dominate
    modes = result["lidar_modes"]
    assert sum(modes[2:4]) >= ledger["modes_23_min"], modes


def test_hard_fixture_sync(hard_bag, tmp_path):
    bag, gt, cfgp = hard_bag
    ledger = json.load(open(LEDGER))
    result = _run(bag, gt, cfgp, str(tmp_path) + "/hsync_", threaded=False)
    _check_ledger(result, ledger, tol=1.2)


def test_hard_fixture_threaded(hard_bag, tmp_path):
    bag, gt, cfgp = hard_bag
    ledger = json.load(open(LEDGER))
    result = _run(bag, gt, cfgp, str(tmp_path) + "/hthr_", threaded=True)
    _check_ledger(result, ledger, tol=1.6, abs_floor=0.5)


if __name__ == "__main__":
    # ledger (re)generation: run the sync ladder under the SAME XLA
    # environment the test suite uses (8 virtual CPU devices) — the
    # device count changes XLA:CPU reduction partitioning, and the SLAM
    # pipeline is chaotic enough to amplify those last-bit differences
    import sys
    import tempfile
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    d = tempfile.mkdtemp()
    bag, gt, cfgp = d + "/hard.bag", d + "/gt.txt", d + "/cfg.json"
    record_hard_fixture_bag(bag, duration=DURATION, lidar_hz=LIDAR_HZ,
                            gt_path=gt)
    json.dump(hard_cfg().to_dict(), open(cfgp, "w"))
    result = _run(bag, gt, cfgp, d + "/ledger_", threaded=False)
    m = result["mapping"]
    ledger = {
        "ate_frontend_m": result["ate_frontend_m"],
        "ate_midend_m": result["ate_midend_m"],
        "ate_backend_m": result["ate_backend_m"],
        "loops_closed_min": max(1, m["loops_closed"] // 2),
        "evictions_min": max(1, m["evictions"] // 2),
        "map_refreshes_min": max(1, m["map_refreshes"] // 2),
        "modes_23_min": max(1, sum(result["lidar_modes"][2:4]) // 2),
        "_generated_from": {k: result[k] for k in
                            ("mapping", "lidar_modes", "frontend_poses",
                             "midend_poses", "backend_poses", "map_points")},
    }
    LEDGER.parent.mkdir(parents=True, exist_ok=True)
    json.dump(ledger, open(LEDGER, "w"), indent=1)
    print(json.dumps(ledger, indent=1))
