"""Real-time-mode accuracy under load shedding (VERDICT r3 task 4).

The reference deliberately sheds stale sweeps when mapping lags
(reference: lidar_mapping/src/localMapping.cpp:328-332 queue drain) and
still produces its maps.  This test drives the hard bag through the
PRODUCTION threaded path (DROP_OLDEST, no --lossless) with the feeder
paced to fixed multiples of the machine's measured sync throughput, and
checks the degradation envelope:

  * the pipeline survives over-capacity load without failures;
  * the mapping stage actually sheds (the mechanism under test fires);
  * estimator accuracy (midend ATE) does not collapse — shedding starves
    the MAP, not the VIO window;
  * under moderate over-capacity the backend still closes loops.

The measured ladder is written to SHEDDING.md by --regen for the judged
degradation table.
"""

import dataclasses
import json
import pathlib
import time

import numpy as np
import pytest

from mvil_fusion_tpu.config import (GlobalMappingConfig, LidarConfig,
                                    LocalMappingConfig, TrackerConfig)
from mvil_fusion_tpu.io.fixture import fixture_config, record_hard_fixture_bag

pytestmark = pytest.mark.slow

DURATION = 45.0
LIDAR_HZ = 10.0


def _cfg():
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
            floor_height=1.2, proximity_threshold=3.0,
            skip_recent_poses=8, sc_num_exclude_recent=8,
            poses_before_reclosing=6, z_refresh_jump=0.3,
            pg_n_max=64, pg_e_max=512, pg_z_max=128))


@pytest.fixture(scope="module")
def shed_bag(tmp_path_factory):
    d = tmp_path_factory.mktemp("shedbag")
    bag, gt = str(d / "shed.bag"), str(d / "gt.txt")
    record_hard_fixture_bag(bag, duration=DURATION, lidar_hz=LIDAR_HZ,
                            gt_path=gt)
    cfgp = str(d / "cfg.json")
    json.dump(_cfg().to_dict(), open(cfgp, "w"))
    return bag, gt, cfgp


def _run(bag, gt, cfgp, out, pace=None, lossless=False):
    from mvil_fusion_tpu import run as runner
    argv = ["--bag", bag, "--config", cfgp, "--out", out, "--golden", gt]
    if pace is None and not lossless:
        pass                      # sync reference run
    else:
        argv += ["--threaded"]
        if lossless:
            argv += ["--lossless"]
        if pace is not None:
            argv += ["--pace", str(pace)]
    return runner.main(argv)


def run_ladder(bag, gt, cfgp, outdir):
    """Sync baseline + paced DROP_OLDEST runs at 1.5x and 3x measured
    capacity.  Returns [(label, pace, result), ...]."""
    sync = _run(bag, gt, cfgp, f"{outdir}/sync_")
    cap = sync["sensor_sec_per_sec"]
    rows = [("sync", None, sync)]
    for label, factor in (("shed1.5x", 1.5), ("shed3x", 3.0)):
        res = _run(bag, gt, cfgp, f"{outdir}/{label}_", pace=cap * factor)
        rows.append((label, round(cap * factor, 3), res))
    return rows


def test_shedding_accuracy(shed_bag, tmp_path):
    bag, gt, cfgp = shed_bag
    rows = run_ladder(bag, gt, cfgp, str(tmp_path))
    sync = rows[0][2]
    assert sync["failures"] == 0

    for label, _pace, res in rows[1:]:
        # survives over-capacity, no estimator failures
        assert res["failures"] == 0, (label, res)
        # the mechanism under test fires: mapping shed stale sweeps
        shed_map = res["msgs"]["shed"].get("mapping", 0)
        assert shed_map > 0, (label, res["msgs"])
        # VIO quality does not collapse: shedding starves the map, not
        # the window (generous band: thread timing is nondeterministic)
        assert res["ate_midend_m"] <= max(3.0 * sync["ate_midend_m"],
                                          0.8), (label, res)
        # a backend trajectory still exists (mapping kept SOME sweeps)
        assert res["backend_poses"] >= 3, (label, res)

    # moderate over-capacity: loop machinery still works
    moderate = rows[1][2]
    assert moderate["mapping"]["loops_closed"] >= 1, moderate["mapping"]


if __name__ == "__main__":
    # regenerate SHEDDING.md (the committed degradation table)
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
    bag, gt = d + "/shed.bag", d + "/gt.txt"
    record_hard_fixture_bag(bag, duration=DURATION, lidar_hz=LIDAR_HZ,
                            gt_path=gt)
    cfgp = d + "/cfg.json"
    json.dump(_cfg().to_dict(), open(cfgp, "w"))
    rows = run_ladder(bag, gt, cfgp, d)
    out = pathlib.Path(__file__).parent.parent / "SHEDDING.md"
    lines = [
        "# Shedding degradation ladder (regenerated by "
        "`python tests/test_shedding_accuracy.py`)",
        "",
        f"{DURATION:.0f} s hard bag at {LIDAR_HZ:.0f} Hz LiDAR, production "
        "threaded path (DROP_OLDEST), feeder paced to fixed multiples of "
        "the measured sync capacity of this machine.",
        "",
        "| run | pace (sensor-s/s) | mapping shed | loops | ATE mid (m) | "
        "ATE back (m) | RPE mid (m/s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for label, pace, res in rows:
        shed = (res["msgs"].get("shed", {}).get("mapping", 0)
                if isinstance(res["msgs"].get("shed"), dict) else 0)
        lines.append(
            f"| {label} | {pace if pace else 'unpaced (sync)'} | {shed} | "
            f"{res['mapping']['loops_closed']} | "
            f"{res.get('ate_midend_m', float('nan')):.3f} | "
            f"{res.get('ate_backend_m', float('nan')):.3f} | "
            f"{res.get('rpe_midend_m_per_s', float('nan')):.3f} |")
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
