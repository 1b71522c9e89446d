"""Async full-system pipeline: VilSystem stages over native channels.

The reference runs six concurrent ROS nodes (reference:
estimator_node.cpp:552-559 and the node graph of SURVEY.md §1); here the
same concurrency shape is three pipeline stages, each the single owner of
its components, connected by the bounded native channels of
`pipeline/channels.py`:

  frontend  — KLT tracker (images) + lidar compensator (sweeps)
  estimator — VIO window BA, IMU intake, feature-depth lookup, deskew+VGICP
  mapping   — LOAM feature extraction, local scan-to-map, global pose graph

Backward edges (the reference's feedback topics) are explicit channels the
owning stage drains at its own pace: mapping → estimator LPS poses
(/laser_localizer), estimator → frontend not needed (the depth register
lives with the estimator, as its lookup needs window state).

`run_threaded` drives a full message stream through the threaded pipeline;
`Pipeline(deterministic=True)` (see tests) keeps the reproducible-drain
mode for testing the identical stage functions.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from mvil_fusion_tpu.pipeline.channels import Channel, Closed, Policy
from mvil_fusion_tpu.pipeline.runner import MultiOut, Pipeline


def build_pipeline(system, deterministic: bool = False) -> Pipeline:
    """Wire a VilSystem onto a 3-stage pipeline.  Returns the Pipeline;
    feed sensor tuples ('imu'|'image'|'lidar', t, payload) to stage 0."""
    pipe = Pipeline(deterministic=deterministic)
    # mapping → estimator LPS feedback (small, drop-oldest like the
    # reference's bounded subscriber queues)
    lps_ch = Channel(capacity=8, policy=Policy.DROP_OLDEST)
    pipe.lps_channel = lps_ch

    def frontend(msg):
        kind, t, payload = msg
        if kind == "imu":
            return msg
        if kind == "image":
            (img,) = payload
            frame = system.tracker.process(t, img)
            if frame is None:
                return None
            # lidar-aided feature depth on THIS stage (the reference's
            # DepthRegister lives in the tracker node too,
            # feature_tracker_node.cpp:252-337) — overlaps the lookup's
            # device round-trip with the estimator's solve
            ids = frame.ids[frame.valid]
            norm = frame.norm[frame.valid]
            vel = frame.vel[frame.valid]
            depth = system._feature_depths(t, norm,
                                           np.ones(len(ids), bool))
            return ("features", t, (ids, norm, vel, depth))
        if kind == "lidar":
            pts, reflectivity = payload
            sweep = system.compensator.process(t, pts)
            return ("sweep", t, (sweep, reflectivity))
        return None

    def _drain_to_mapping(t):
        """Release every sweep the window now covers (the system's l_buf
        analog) as lidar_out messages for the mapping stage."""
        outs = []
        for sweep_, out, refl in system._drain_sweeps():
            system._register_depth_cloud(out)
            outs.append(("lidar_out", t, (sweep_, out, refl)))
        return MultiOut(outs) if outs else None

    def estimator(msg):
        # drain LPS feedback first (non-blocking)
        while True:
            try:
                t_l, p_l, q_l = lps_ch.get(timeout=0.0)
            except (TimeoutError, Closed):
                break
            system.estimator.process_lps(t_l, p_l, q_l)
        kind, t, payload = msg
        if kind == "imu":
            acc, gyr = payload
            system.estimator.process_imu(t, acc, gyr)
            return None
        if kind == "features":
            ids, norm, vel, depth = payload
            system.estimator.process_features(t, ids, norm, vel, depth)
            return _drain_to_mapping(t)   # window advanced
        if kind == "sweep":
            sweep, reflectivity = payload
            system.lidar_sweep_count += 1
            system._pending_sweeps.append((sweep, reflectivity))
            return _drain_to_mapping(t)
        return None

    def mapping(msg):
        _, _, (sweep, out, reflectivity) = msg
        system._map_lidar(sweep, out, reflectivity, lps_sink=lps_ch.put)
        return None

    pipe.add_stage("frontend", frontend, capacity=64)
    pipe.add_stage("estimator", estimator, capacity=256)
    pipe.add_stage("mapping", mapping, capacity=8)
    return pipe


def run_threaded(system, messages: Iterable,
                 max_sensor_time: Optional[float] = None) -> dict:
    """Drive a ('kind', t, payload) stream through the threaded pipeline.

    Message payloads follow io.rosbag.play: imu → (acc, gyr); image →
    (img,); lidar → (fields-dict,).  Returns message counts."""
    pipe = build_pipeline(system, deterministic=False)
    pipe.start()
    counts = {"imu": 0, "image": 0, "lidar": 0}
    t0 = None
    try:
        for kind, t, payload in messages:
            if t0 is None:
                t0 = t
            if max_sensor_time is not None and t - t0 > max_sensor_time:
                break
            counts[kind] = counts.get(kind, 0) + 1
            if kind == "lidar":
                (fields,) = payload
                payload = (fields["pts"], fields.get("intensity"))
            pipe.feed((kind, t, payload))
    finally:
        pipe.stop(timeout=120.0)
    for st in pipe.stages:
        if st.errors:
            raise RuntimeError(
                f"stage {st.name} raised:\n" + "\n".join(st.errors[:3]))
    return counts
