"""The HARD fixture regression: a 90 s multi-floor bag at the reference's
10 Hz LiDAR rate with exact revisits, driven through the offline runner
sync + threaded, checked against a committed expected-metrics ledger
(tests/data/hard_fixture_expected.json).

This is the engine's stand-in for the reference's released-bag validation
(reference README.md:44-57) with numeric teeth, at two graph configs:

  * smallcap — reduced pose-graph caps so capacity EVICTION must fire
    (exercises globalMappingIkdTree.cpp:192-258-style eviction);
  * refcap   — reference-scale caps (pg_n_max=512: no toy-cap eviction),
    the configuration a real deployment would run.

Gates: the loop machinery MUST fire (radius + ScanContext closures,
z-driven graph refreshes), the backend must beat the midend on ATE
(mapping demonstrably helps), ATE/RPE regressing >20 % vs the ledger
fails the sync lane, and behavioral counters sit at the measured values
(sync is deterministic under the suite's XLA flags) with a looser band
for the nondeterministic threaded lane.

Regenerate the ledger after an intentional accuracy change:
    python tests/test_hard_fixture.py --regen
"""

import dataclasses
import json
import pathlib

import numpy as np
import pytest

from mvil_fusion_tpu.config import (GlobalMappingConfig, LidarConfig,
                                    LocalMappingConfig, TrackerConfig)
from mvil_fusion_tpu.io.fixture import fixture_config, record_hard_fixture_bag

pytestmark = pytest.mark.slow

LEDGER = pathlib.Path(__file__).parent / "data" / "hard_fixture_expected.json"
DURATION = 90.0
LIDAR_HZ = 10.0

STAGES = ("frontend", "midend", "backend")


def _base_cfg():
    base = fixture_config()
    return base.replace(
        tracker=TrackerConfig(max_cnt=100, min_dist=25, freq=10,
                              max_features_pad=128),
        estimator=dataclasses.replace(base.estimator, max_features=128),
        lidar=dataclasses.replace(base.lidar, scan_period=1.0 / LIDAR_HZ,
                                  vgicp_iters=8),
        local_mapping=LocalMappingConfig(submap_trigger_dist=1.5,
                                         submap_trigger_frames=8),
    )


def _gm(**caps):
    return GlobalMappingConfig(
        floor_height=1.2,
        proximity_threshold=3.0,
        skip_recent_poses=8,
        sc_num_exclude_recent=8,
        poses_before_reclosing=6,
        z_refresh_jump=0.3,
        **caps)


def smallcap_cfg():
    """Toy graph caps: capacity eviction must fire on the 90 s run."""
    return _base_cfg().replace(
        global_mapping=_gm(pg_n_max=20, pg_e_max=256, pg_z_max=64))


def refcap_cfg():
    """Reference-scale caps (no toy-cap eviction; VERDICT r3 task 3)."""
    return _base_cfg().replace(
        global_mapping=_gm(pg_n_max=512, pg_e_max=4096, pg_z_max=512))


CONFIGS = {"smallcap": smallcap_cfg, "refcap": refcap_cfg}


@pytest.fixture(scope="module")
def hard_bag(tmp_path_factory):
    d = tmp_path_factory.mktemp("hardbag")
    bag = str(d / "hard.bag")
    gt = str(d / "gt_tum.txt")
    record_hard_fixture_bag(bag, duration=DURATION, lidar_hz=LIDAR_HZ,
                            gt_path=gt)
    cfgps = {}
    for name, mk in CONFIGS.items():
        cfgp = str(d / f"cfg_{name}.json")
        json.dump(mk().to_dict(), open(cfgp, "w"))
        cfgps[name] = cfgp
    return bag, gt, cfgps


def _run(bag, gt, cfgp, out, threaded):
    from mvil_fusion_tpu import run as runner
    argv = ["--bag", bag, "--config", cfgp, "--out", out,
            "--golden", gt, "--save-map"]
    if threaded:
        # lossless: on an underpowered CPU box the production DROP_OLDEST
        # policy sheds most sweeps (correct real-time behavior, measured
        # separately by test_shedding_accuracy.py) — back-pressure instead
        argv += ["--threaded", "--lossless"]
    return runner.main(argv)


def _check_ledger(result, ledger, variant, tol, counter_frac,
                  abs_floor_mult=0.0):
    """Gate a run against the committed ledger for `variant`.

    tol           — multiplicative ATE/RPE regression gate (1.2 = 20 %)
    counter_frac  — behavioral counters must reach counter_frac x the
                    measured value (1.0 for the deterministic sync lane)
    abs_floor_mult — threaded lane: ATE below abs_floor_mult x the sync
                    ledger value always passes (thread-schedule noise
                    moves loop-closure timing on absolutely-tiny errors)
    """
    led = ledger[variant]
    m = result["mapping"]

    def counter_min(key):
        return max(1, int(np.floor(counter_frac * led["counters"][key])))

    assert m["loops_closed"] >= counter_min("loops_closed"), m
    assert m["map_refreshes"] >= counter_min("map_refreshes"), m
    if variant == "smallcap":
        # toy caps: eviction must fire; refcap must NOT evict (caps are
        # sized for the whole run — eviction there means a capacity bug)
        assert m["evictions"] >= counter_min("evictions"), m
    else:
        assert m["evictions"] == 0, m
    assert result["failures"] == 0
    assert result["map_points"] > 1000
    # mapping helps: backend beats midend
    assert result["ate_backend_m"] < result["ate_midend_m"], result
    for stage in STAGES:
        for metric in ("ate", "rpe"):
            key = (f"{metric}_{stage}_m" if metric == "ate"
                   else f"{metric}_{stage}_m_per_s")
            floor = abs_floor_mult * led[key]
            assert result[key] <= max(tol * led[key], floor), (
                f"{variant} {key} regressed: {result[key]} vs ledger "
                f"{led[key]} (tol {tol}, floor {floor})")
    # constraint-mode histogram band: registration-driven modes (2/3)
    # must stay near the measured share — a collapse in EITHER direction
    # (all-degenerate or never-degenerate) signals a regression
    modes23 = sum(result["lidar_modes"][2:4])
    lo = int(np.floor(0.7 * led["modes_23"]))
    hi = int(np.ceil(1.3 * led["modes_23"] / counter_frac))
    assert lo <= modes23 <= hi, (result["lidar_modes"], led["modes_23"])


@pytest.mark.parametrize("variant", list(CONFIGS))
def test_hard_fixture_sync(hard_bag, tmp_path, variant):
    bag, gt, cfgps = hard_bag
    ledger = json.load(open(LEDGER))
    result = _run(bag, gt, cfgps[variant],
                  str(tmp_path) + f"/hsync_{variant}_", threaded=False)
    # sync is deterministic under the suite's XLA flags: counters at the
    # measured values, ATE/RPE within 20 %
    _check_ledger(result, ledger, variant, tol=1.2, counter_frac=1.0)


def test_hard_fixture_threaded(hard_bag, tmp_path):
    bag, gt, cfgps = hard_bag
    ledger = json.load(open(LEDGER))
    result = _run(bag, gt, cfgps["smallcap"], str(tmp_path) + "/hthr_",
                  threaded=True)
    # threaded is nondeterministic (stage interleaving): counters at
    # >=60 % of measured, ATE within 1.6x with an absolute floor of
    # 2x the sync backend ledger (VERDICT r3 task 3: <=2x, was 5x)
    _check_ledger(result, ledger, "smallcap", tol=1.6, counter_frac=0.6,
                  abs_floor_mult=2.0)


if __name__ == "__main__":
    # ledger (re)generation: run the sync ladder for BOTH configs under
    # the SAME XLA environment the test suite uses (8 virtual CPU
    # devices) — the device count changes XLA:CPU reduction partitioning,
    # and the SLAM pipeline is chaotic enough to amplify those last-bit
    # differences
    import os
    import sys
    import tempfile
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    d = tempfile.mkdtemp()
    bag, gt = d + "/hard.bag", d + "/gt.txt"
    record_hard_fixture_bag(bag, duration=DURATION, lidar_hz=LIDAR_HZ,
                            gt_path=gt)
    ledger = {}
    for name, mk in CONFIGS.items():
        cfgp = d + f"/cfg_{name}.json"
        json.dump(mk().to_dict(), open(cfgp, "w"))
        result = _run(bag, gt, cfgp, d + f"/ledger_{name}_",
                      threaded=False)
        m = result["mapping"]
        ledger[name] = {
            **{k: result[k] for k in
               [f"ate_{s}_m" for s in STAGES]
               + [f"rpe_{s}_m_per_s" for s in STAGES]},
            "counters": {
                "loops_closed": m["loops_closed"],
                "evictions": m["evictions"],
                "map_refreshes": m["map_refreshes"],
            },
            "modes_23": sum(result["lidar_modes"][2:4]),
            "_generated_from": {k: result[k] for k in
                                ("mapping", "lidar_modes",
                                 "frontend_poses", "midend_poses",
                                 "backend_poses", "map_points")},
        }
        print(f"--- {name}: {json.dumps(ledger[name], indent=1)}",
              flush=True)
    LEDGER.parent.mkdir(parents=True, exist_ok=True)
    json.dump(ledger, open(LEDGER, "w"), indent=1)
    print("ledger written:", LEDGER)
