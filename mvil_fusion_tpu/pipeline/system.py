"""Full VIL-SLAM system: one deterministic pipeline.

Replaces the reference's six ROS processes + topic graph (SURVEY.md §1) with
a single-process pipeline of jitted stages:

  image  ──► FeatureTracker ──► VIOEstimator (window BA) ──► trajectory
  imu    ───────────────────────────┤  ▲     │
  lidar  ──► LidarCompensator ──────┘  │     ├─► deskewed cloud ─► DepthRegister
                                       │     │        (lidar-aided feature depth)
             LPS feedback ◄────────────┘     ├─► LOAM features ─► LocalMapper
                                             │                        │ submaps
             GlobalMapper ◄───────────────────────────────────────────┘
                (pose graph + loops)  → /laser_localizer → estimator LPS

Every cross-stage hop that was a serialized ROS message is now an in-process
typed value; ordering is deterministic (sensor timestamps drive the calls).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.estimator.vio import VIOEstimator
from mvil_fusion_tpu.frontend.depth_register import DepthRegister
from mvil_fusion_tpu.frontend.feature_tracker import FeatureTracker
from mvil_fusion_tpu.frontend.lidar_compensator import LidarCompensator
from mvil_fusion_tpu.mapping.global_mapping import GlobalMapper
from mvil_fusion_tpu.mapping.local_mapping import LocalMapper
from mvil_fusion_tpu.ops import loam_features as lfe
from mvil_fusion_tpu.utils import lie

_organize_jit = jax.jit(lfe.organize_grid,
                        static_argnames=("n_rings", "n_azimuth",
                                         "scan_period"))
def _np_quat_to_mat(q):
    w, x, y, z = np.asarray(q, np.float64)
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.asarray([aw * bw - ax * bx - ay * by - az * bz,
                       aw * bx + ax * bw + ay * bz - az * by,
                       aw * by - ax * bz + ay * bw + az * bx,
                       aw * bz + ax * by - ay * bx + az * bw])
_extract_jit = jax.jit(lfe.extract,
                       static_argnames=("n_subregions", "sharp_per_region",
                                        "less_sharp_per_region",
                                        "flat_per_region",
                                        "curvature_threshold", "min_range",
                                        "use_intensity_mask"))

GRID_AZ = 1024


class VilSystem:
    """Config 3/4 of BASELINE.json: indoor/outdoor full SLAM."""

    def __init__(self, cfg: SystemConfig, use_tracker: bool = False,
                 enable_mapping: bool = True):
        self.cfg = cfg
        self.estimator = VIOEstimator(cfg)
        self.estimator.enable_lidar()
        self.tracker = FeatureTracker(cfg) if use_tracker else None
        self.compensator = LidarCompensator(cfg)
        self.depth_register = DepthRegister(cfg)
        self.local_mapper = LocalMapper(cfg) if enable_mapping else None
        self.global_mapper = GlobalMapper(cfg) if enable_mapping else None
        self.lidar_sweep_count = 0
        # sweeps waiting for the VIO window to cover their time span (the
        # reference's l_buf: the lidar thread holds clouds until fresh
        # odometry brackets them, estimator_node.cpp:338-376)
        self._pending_sweeps: list = []

    # ----------------------------------------------------------- sensors

    def process_imu(self, t: float, acc, gyr):
        self.estimator.process_imu(t, acc, gyr)

    def process_features(self, t: float, ids, norm, vel):
        """Direct feature injection (when an external tracker is used)."""
        depth = self._feature_depths(t, norm, np.ones(len(ids), bool))
        self.estimator.process_features(t, ids, norm, vel, depth)
        self._pump_lidar()

    def process_image(self, t: float, img: np.ndarray):
        assert self.tracker is not None, "system built without tracker"
        frame = self.tracker.process(t, img)
        if frame is None:
            return
        ids = frame.ids[frame.valid]
        norm = frame.norm[frame.valid]
        vel = frame.vel[frame.valid]
        depth = self._feature_depths(t, norm, np.ones(len(ids), bool))
        self.estimator.process_features(t, ids, norm, vel, depth)
        self._pump_lidar()

    def _camera_pose_host(self):
        """T_w_c from the estimator's host pose cache (one-frame-stale by
        design — a fresh fetch would cost a tunnel round-trip)."""
        est = self.estimator
        cached = getattr(est, "last_pose_host", None)
        if cached is not None:
            p_b, q_b, tic, qic = cached
        else:
            k = min(est.frame_count, est.W - 1)
            p_b = np.asarray(est.state.p[k])
            q_b = np.asarray(est.state.q[k])
            tic = np.asarray(est.state.tic)
            qic = np.asarray(est.state.qic)
        q_c = _np_quat_mul(np.asarray(q_b, np.float64),
                           np.asarray(qic, np.float64))
        q_c = (q_c / np.linalg.norm(q_c)).astype(np.float32)
        p_c = (np.asarray(p_b)
               + _np_quat_to_mat(q_b) @ np.asarray(tic)).astype(np.float32)
        return p_c, q_c

    def _feature_depths_device(self, t, norm_dev, valid_dev):
        """Enqueue-only depth lookup on full-capacity DEVICE feature
        arrays (deferred-readback frontend): returns a device (N,) depth
        vector or None when no cloud is live."""
        if not self.depth_register.clouds:
            return None
        p_c, q_c = self._camera_pose_host()
        return self.depth_register.get_depth_device(t, norm_dev, valid_dev,
                                                    p_c, q_c)

    def flush(self):
        """Drain every deferred readback (end of stream): estimator pack,
        lidar sweep pack, local-mapping pack (may emit a final submap)."""
        if self.estimator.lidar is not None:
            self.estimator.lidar._harvest_pack()
        self.estimator.flush()
        if self.local_mapper is not None:
            sm = self.local_mapper.flush()
            if sm is not None and self.global_mapper is not None:
                info = self.global_mapper.add_submap(sm)
                self.estimator.process_lps(info["t"], info["p"], info["q"])

    def _feature_depths(self, t, norm, valid):
        """LiDAR-aided feature depth (the reference's DepthRegister path,
        feature_tracker_node.cpp:252-337).  Host-side math on the pose the
        estimator already fetched this frame — no device round-trips."""
        if not self.depth_register.clouds:
            return None
        p_c, q_c = self._camera_pose_host()
        # pad to a STATIC feature capacity: a varying live-feature count
        # would recompile the depth-register program every frame
        n = len(norm)
        cap = max(self.cfg.tracker.max_features_pad, n)
        norm_p = np.zeros((cap, 2), np.float32)
        norm_p[:n] = norm
        valid_p = np.zeros(cap, bool)
        valid_p[:n] = valid
        depth = self.depth_register.get_depth(t, norm_p, valid_p, p_c, q_c)
        return depth[:n]

    def process_lidar(self, t_start: float, pts: np.ndarray,
                      valid: np.ndarray | None = None,
                      reflectivity: np.ndarray | None = None):
        """One raw sweep through compensator → estimator → mapping.

        reflectivity: optional per-point sensor intensity; carried through
        the LOAM chain (the reference's mapping nodes keep the original
        intensity channel)."""
        sweep = self.compensator.process(t_start, pts, valid)
        self.lidar_sweep_count += 1
        self._pending_sweeps.append((sweep, reflectivity))
        res = None
        for sweep_, out, refl in self._drain_sweeps():
            self._register_depth_cloud(out)
            res = self._map_lidar(sweep_, out, refl)
        return res

    def _drain_sweeps(self):
        """Process every buffered sweep the VIO window now covers; drop
        sweeps that fell off the window (the reference's stale-cloud
        load-shedding)."""
        est = self.estimator
        done = []
        if est.status != est.NON_LINEAR or est.lidar is None:
            self._pending_sweeps = self._pending_sweeps[-5:]
            return done
        n_t = min(len(est.times), est.W)
        times = est.times[:n_t]
        if not times:
            return done
        period = self.cfg.lidar.scan_period
        keep = []
        for sweep, refl in self._pending_sweeps:
            t_end = sweep.t_start + period
            if sweep.t_start < times[0]:
                continue                      # stale — drop
            if t_end > times[-1]:
                keep.append((sweep, refl))    # too new — wait for frames
                continue
            out = est.process_lidar(sweep.t_start, sweep.pts,
                                    sweep.rel_time, sweep.mask)
            if out is not None:
                done.append((sweep, out, refl))
        self._pending_sweeps = keep
        return done

    def _pump_lidar(self):
        """Drain newly-bracketed sweeps after the window advanced."""
        for sweep_, out, refl in self._drain_sweeps():
            self._register_depth_cloud(out)
            self._map_lidar(sweep_, out, refl)

    def _register_depth_cloud(self, out):
        """Deskewed world cloud → depth register (every 2nd sweep ≈ 5 Hz,
        feature_tracker_node.cpp:255).  Owned by the estimator stage in the
        async pipeline (the reference's DepthRegister subscribes to the
        estimator's lidar_cloud topic)."""
        if self.lidar_sweep_count % 2 == 0:
            # everything stays on device (ring-buffered world cloud)
            self.depth_register.add_cloud(out["t_end"], out["pts"],
                                          out["mask"], out["p_l"],
                                          out["q_l"])

    def _map_lidar(self, sweep, out, reflectivity=None, lps_sink=None):
        """Post-estimator LiDAR path: LOAM feature extraction + local/
        global mapping (the async pipeline runs this on the mapping stage;
        lps_sink redirects the localizer feedback into a channel instead of
        calling into the estimator from another thread)."""
        if self.local_mapper is None:
            return out

        # the whole mapping stage (LOAM extraction from the full deskewed
        # cloud + scan-to-map + map/submap upkeep) is ONE fused program
        lc = self.cfg.lidar
        lm = self.cfg.local_mapping
        inten = None if (reflectivity is None or not lm.use_intensity) \
            else jnp.asarray(reflectivity, jnp.float32)
        sm = self.local_mapper.process_full(
            out["t_end"], out["full_pts"], sweep.ring, sweep.rel_time,
            out["full_mask"], inten, out["p_l"], out["q_l"],
            n_rings=lc.n_rings, n_azimuth=GRID_AZ,
            scan_period=lc.scan_period)
        if sm is not None and self.global_mapper is not None:
            info = self.global_mapper.add_submap(sm)
            # LPS feedback (the /laser_localizer → estimator loop)
            if lps_sink is None:
                self.estimator.process_lps(info["t"], info["p"], info["q"])
            else:
                lps_sink((info["t"], info["p"], info["q"]))
        return out

    # ------------------------------------------------------------ outputs

    def frontend_trajectory(self):
        return self.estimator.trajectory

    def midend_trajectory(self):
        return self.local_mapper.trajectory if self.local_mapper else []

    def backend_trajectory(self):
        return self.global_mapper.trajectory() if self.global_mapper else []

    def save_results(self, prefix: str):
        """Write Frontend/Midend/Backend.txt (TUM format) like the
        reference's result files (SURVEY.md §4)."""
        def dump(path, rows):
            with open(path, "w") as f:
                for row in rows:
                    t, p, q = row[0], row[1], row[2]
                    f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")

        dump(prefix + "Frontend.txt",
             [(t, p, q) for (t, p, q, *_) in self.estimator.trajectory])
        if self.local_mapper:
            dump(prefix + "Midend.txt", self.local_mapper.trajectory)
        if self.global_mapper:
            dump(prefix + "Backend.txt", self.global_mapper.trajectory())
        # online extrinsic stream (reference ex_results.txt,
        # estimator_node.cpp:312-336): t, cam-IMU ypr+t, lidar-IMU ypr+t, td
        with open(prefix + "ex_results.txt", "w") as f:
            for t, vi_ypr, vi_t, li_ypr, li_t, td in self.estimator.ex_results:
                vals = [*vi_ypr, *vi_t, *li_ypr, *li_t, td]
                f.write(f"{t:.6f} " + " ".join(f"{v:.6f}" for v in vals)
                        + "\n")
