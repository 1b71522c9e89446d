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

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.pipeline.channels import Channel, Closed, Policy
from mvil_fusion_tpu.pipeline.runner import MultiOut, Pipeline


def build_pipeline(system, deterministic: bool = False,
                   defer_readbacks: bool | None = None,
                   shed_mapping: bool = True) -> Pipeline:
    """Wire a VilSystem onto a 3-stage pipeline.  Returns the Pipeline;
    feed sensor tuples ('imu'|'image'|'lidar', t, payload) to stage 0.

    defer_readbacks (default: on for threaded, off for deterministic):
    every stage's per-event packed fetch becomes copy_to_host_async +
    harvest-at-the-next-event, so no stage ever blocks on the shared
    device queue behind another stage's in-flight programs — the round-2
    throughput ceiling.  Results are identical; host-visible values lag
    one event.  Feed ("flush", t, ()) at end of stream to drain the lag."""
    pipe = Pipeline(deterministic=deterministic)
    if defer_readbacks is None:
        defer_readbacks = not deterministic
    if defer_readbacks:
        system.estimator.defer_readback = True
        if system.estimator.lidar is not None:
            system.estimator.lidar.defer_pack = True
        if system.local_mapper is not None:
            system.local_mapper.defer_pack = True
    # mapping → estimator LPS feedback (small, drop-oldest like the
    # reference's bounded subscriber queues)
    lps_ch = Channel(capacity=8, policy=Policy.DROP_OLDEST)
    pipe.lps_channel = lps_ch

    # one-slot deferred publish state of the frontend stage (single owner)
    pending_pub: list = []
    # parallel image ingest: H2D rides a small thread pool so the upload
    # of frame k+1 overlaps the tracking of frame k (single-thread
    # transfers serialize on the tunnel at ~14-30 ms/img; two client
    # threads overlap them and compute overlaps transfers).  The tracker
    # still consumes frames strictly in arrival order.
    n_up = max(0, int(getattr(system.cfg.tracker, "upload_workers", 0))) \
        if not deterministic else 0
    upload_pool = ThreadPoolExecutor(max_workers=n_up) if n_up > 1 else None
    pending_imgs: deque = deque()   # (t, Future[device image])
    MAX_INFLIGHT = 4
    # LiDAR ingest rides its own single worker: one sweep in flight at a
    # time keeps the compensator's host state strictly sequential while
    # its 170 KB H2D overlaps the tracker's work on this stage
    lidar_pool = (ThreadPoolExecutor(max_workers=1) if upload_pool
                  is not None else None)
    pending_sweeps: deque = deque()   # Future[("sweep", t, payload)]

    def _harvest_pub():
        t_p, packed_dev, depth_dev = pending_pub.pop()
        frame = system.tracker.publish_from_packed(t_p,
                                                   np.asarray(packed_dev))
        ids = frame.ids[frame.valid]
        norm = frame.norm[frame.valid]
        vel = frame.vel[frame.valid]
        depth = (np.asarray(depth_dev)[frame.valid]
                 if depth_dev is not None else None)
        return ("features", t_p, (ids, norm, vel, depth))

    def _track_one(t, img):
        """Track one (possibly device-resident) image; deferred-publish
        bookkeeping.  Returns a features message or None."""
        publish, out = system.tracker.process_device(t, img)
        res = _harvest_pub() if pending_pub else None
        if publish:
            depth_dev = system._feature_depths_device(t, out.norm,
                                                      out.valid)
            for a in (out.packed, depth_dev):
                if a is not None:
                    try:
                        a.copy_to_host_async()
                    except AttributeError:
                        pass
            pending_pub.append((t, out.packed, depth_dev))
        return res

    def _drain_uploads(block: bool):
        """Feed completed uploads (in order) to the tracker.  With
        block=False only heads whose transfer finished are consumed,
        unless the in-flight window is full — identical results either
        way, the order is strict."""
        outs = []
        while pending_imgs:
            head_done = pending_imgs[0][1].done()
            if not (block or head_done
                    or len(pending_imgs) > MAX_INFLIGHT):
                break
            ti, fut = pending_imgs.popleft()
            res = _track_one(ti, fut.result())
            if res is not None:
                outs.append(res)
        return outs

    def _drain_sweep_uploads(block: bool):
        outs = []
        while pending_sweeps:
            if not (block or pending_sweeps[0].done()
                    or len(pending_sweeps) > 2):
                break
            outs.append(pending_sweeps.popleft().result())
        return outs

    def frontend(msg):
        kind, t, payload = msg
        if kind == "imu":
            return msg
        if kind == "flush":
            outs = _drain_uploads(block=True)
            outs.extend(_drain_sweep_uploads(block=True))
            if pending_pub:
                outs.append(_harvest_pub())
            outs.append(msg)
            return MultiOut(outs)
        if kind == "image":
            (img,) = payload
            if not defer_readbacks:
                frame = system.tracker.process(t, img)
                if frame is None:
                    return None
                # lidar-aided feature depth on THIS stage (the reference's
                # DepthRegister lives in the tracker node too,
                # feature_tracker_node.cpp:252-337)
                ids = frame.ids[frame.valid]
                norm = frame.norm[frame.valid]
                vel = frame.vel[frame.valid]
                depth = system._feature_depths(t, norm,
                                               np.ones(len(ids), bool))
                return ("features", t, (ids, norm, vel, depth))
            if upload_pool is None:
                res = _track_one(t, img)
                return res
            # parallel ingest: enqueue the transfer, consume whatever
            # finished (order-preserving)
            pending_imgs.append((t, upload_pool.submit(jnp.asarray, img)))
            outs = _drain_uploads(block=False)
            if not outs:
                return None
            return MultiOut(outs) if len(outs) > 1 else outs[0]
        if kind == "lidar":
            pts, reflectivity = payload
            if lidar_pool is None:
                sweep = system.compensator.process(t, pts)
                return ("sweep", t, (sweep, reflectivity))
            pending_sweeps.append(lidar_pool.submit(
                lambda t=t, pts=pts, refl=reflectivity:
                ("sweep", t, (system.compensator.process(t, pts), refl))))
            outs = _drain_sweep_uploads(block=False)
            if not outs:
                return None
            return MultiOut(outs) if len(outs) > 1 else outs[0]
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
        if kind == "flush":
            if system.estimator.lidar is not None:
                system.estimator.lidar._harvest_pack()
            system.estimator.flush()
            return msg
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
        kind = msg[0]
        if kind == "flush":
            if system.local_mapper is not None:
                sm = system.local_mapper.flush()
                if sm is not None and system.global_mapper is not None:
                    info = system.global_mapper.add_submap(sm)
                    lps_ch.put((info["t"], info["p"], info["q"]))
            return None
        _, _, (sweep, out, reflectivity) = msg
        system._map_lidar(sweep, out, reflectivity, lps_sink=lps_ch.put)
        return None

    pipe.add_stage("frontend", frontend, capacity=64)
    pipe.add_stage("estimator", estimator, capacity=256)
    # DROP_OLDEST: when mapping lags it sheds stale sweeps instead of
    # back-pressuring the estimator — the reference's localMapping does
    # exactly this with its queue drain (localMapping.cpp:328-332); the
    # flush sentinel must never be shed, so capacity stays comfortably
    # above the in-flight sweep count.  shed_mapping=False (offline
    # lossless replay) back-pressures instead so every sweep is mapped.
    pipe.add_stage("mapping", mapping, capacity=8,
                   policy=Policy.DROP_OLDEST if shed_mapping
                   else Policy.BLOCK)
    pipe.upload_pool = upload_pool   # for teardown by the driver
    pipe.lidar_pool = lidar_pool
    return pipe


def run_threaded(system, messages: Iterable,
                 max_sensor_time: Optional[float] = None,
                 shed_mapping: bool = True) -> dict:
    """Drive a ('kind', t, payload) stream through the threaded pipeline.

    Message payloads follow io.rosbag.play: imu → (acc, gyr); image →
    (img,); lidar → (fields-dict,).  Returns message counts."""
    pipe = build_pipeline(system, deterministic=False,
                          shed_mapping=shed_mapping)
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
        pipe.feed(("flush", t0 if t0 is not None else 0.0, ()))
    finally:
        pipe.stop(timeout=120.0)
        for pool in (getattr(pipe, "upload_pool", None),
                     getattr(pipe, "lidar_pool", None)):
            if pool is not None:
                pool.shutdown(wait=False)
    for st in pipe.stages:
        if st.errors:
            raise RuntimeError(
                f"stage {st.name} raised:\n" + "\n".join(st.errors[:3]))
    # shed counts: DROP_OLDEST channels report how many stale messages
    # they discarded under load (the reference's deliberate stale-cloud
    # drops, localMapping.cpp:328-332)
    counts["shed"] = {st.name: st.inbox.dropped for st in pipe.stages}
    return counts
