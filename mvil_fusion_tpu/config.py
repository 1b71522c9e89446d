"""Typed configuration system for the TPU-native VIL-SLAM engine.

This replaces the reference's two-tier OpenCV-YAML + rosparam config
(reference: vils_estimator/src/parameters.cpp:71-221,
feature_tracker_/src/parameters.cpp, launch/mynteye_leishen_indoor.launch)
with frozen dataclasses that can be constructed from a plain dict / YAML /
JSON file.  Default values reproduce `config/mynteye_leishen_indoor.yaml`.

Everything that affects traced computations is a static Python value here, so
changing a config triggers a clean re-jit rather than dynamic-shape churn.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _freeze(x):
    if isinstance(x, list):
        return tuple(_freeze(v) for v in x)
    return x


@dataclass(frozen=True)
class CameraConfig:
    """Camera intrinsics (reference: camera_model CameraFactory.cc; pinhole
    defaults reproduce config/mynteye_leishen_indoor.yaml:8-22).

    `model` selects pinhole (radtan: k1,k2,p1,p2), mei (adds xi),
    equidistant (Kannala-Brandt: k2..k5), or scaramuzza (poly + affine
    c,d,e) — all four camodocal models the reference vendors."""

    model: str = "pinhole"
    width: int = 640
    height: int = 480
    fx: float = 356.37000498
    fy: float = 354.92225534
    cx: float = 326.87903275
    cy: float = 250.93806883
    k1: float = -0.29326213
    k2: float = 0.07505211
    p1: float = 0.0002761
    p2: float = -0.00026777
    fisheye: bool = False
    # MEI (CataCamera) mirror parameter
    xi: float = 1.0
    # equidistant (Kannala-Brandt) higher-order terms (k2 shared above)
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    # Scaramuzza polynomial z = Σ poly[k]·ρ^k and affine [c d; e 1]
    poly: Tuple[float, ...] = (-200.0, 0.0, 0.001)
    aff_c: float = 1.0
    aff_d: float = 0.0
    aff_e: float = 0.0

    @property
    def intrinsics(self) -> Tuple[float, float, float, float]:
        return (self.fx, self.fy, self.cx, self.cy)

    @property
    def distortion(self) -> Tuple[float, float, float, float]:
        return (self.k1, self.k2, self.p1, self.p2)


@dataclass(frozen=True)
class TrackerConfig:
    """KLT feature-tracker front end (reference: feature_tracker_/src/
    parameters.h:60-92, yaml:67-73)."""

    max_cnt: int = 150           # max tracked features
    min_dist: int = 30           # min pixel distance between features
    freq: int = 10               # publish rate Hz (0 = image rate)
    f_threshold: float = 1.0     # fundamental RANSAC threshold (px)
    equalize: bool = True        # CLAHE on input image
    window_size: int = 21        # LK patch size
    pyramid_levels: int = 3      # LK pyramid levels
    max_iters: int = 10          # LK iterations per level
    min_eig_threshold: float = 1e-4
    ransac_iters: int = 256      # fundamental-matrix hypotheses (batched)
    # static padded capacity for feature slots on device (>= max_cnt,
    # multiple of 128 for TPU lane alignment)
    max_features_pad: int = 256
    border: int = 1              # border margin for culling (px)
    # threaded-pipeline image-upload concurrency: H2D of frame k+1..k+n
    # rides parallel client connections while the tracker processes frame
    # k.  Measured on the tunnel: transfers from ONE thread serialize
    # (~14-30 ms/img, content-dependent) but two threads overlap them
    # 1.5x, and compute overlaps transfers — so a small pool hides most
    # of the ingest latency.  0/1 = upload inline (deterministic path).
    upload_workers: int = 2


@dataclass(frozen=True)
class ImuConfig:
    """IMU noise model (reference yaml:80-87)."""

    acc_n: float = 0.02065
    gyr_n: float = 0.00519
    acc_w: float = 0.00667
    gyr_w: float = 0.00088056
    g_norm: float = 9.795
    rate_hz: float = 200.0
    # static padded capacity of IMU samples per image interval
    max_imu_per_frame: int = 64


@dataclass(frozen=True)
class EstimatorConfig:
    """Sliding-window VIO core (reference: vils_estimator/src/parameters.h:12-15,
    yaml:24-45,75-77,89-118)."""

    window_size: int = 6          # +1 = frames in window (reference WINDOW_SIZE)
    focal_length: float = 460.0   # virtual focal for info weighting
    min_parallax: float = 10.0    # keyframe threshold px (/focal at use site)
    max_solver_iters: int = 8     # LM iterations per solve (ref <=30 but 50ms cap)
    # per-frame solver wall-clock budget (reference: ceres
    # max_solver_time_in_seconds = 0.05, estimator.cpp:1400-1414).  XLA
    # programs cannot early-exit on wall clock, so the TPU-idiomatic
    # equivalent is ADAPTIVE iteration selection: when a solve overruns
    # the budget the next frame drops to min_solver_iters (a separately
    # compiled variant), stepping back up after sustained headroom.
    # <=0 disables adaptation.
    solver_time_budget_s: float = 0.05
    min_solver_iters: int = 4
    estimate_extrinsic: int = 1   # 0 fixed / 1 refine / 2 calibrate
    estimate_td: bool = True
    td_init: float = 0.00003
    # camera-IMU extrinsic initial guess (row-major R, t) — imu^T_cam
    ric: Tuple[float, ...] = (
        0.99999072, -0.00209387, -0.00376471,
        -0.00208308, -0.99999371, 0.0028693,
        -0.0037707, -0.00286143, -0.9999888,
    )
    tic: Tuple[float, ...] = (-0.04571386, 0.01268073, -0.01535602)
    # initialization bounds (reference yaml:90-101 PBC_* box)
    pbc_upper: Tuple[float, ...] = (-0.04, 0.01, 0.01)
    pbc_lower: Tuple[float, ...] = (-0.06, -0.01, -0.01)
    angle_vi: float = 30.0        # degrees; init parallax gate
    # feature capacity inside the window (static shape)
    max_features: int = 256       # padded landmark slots (ref NUM_OF_F=1000)
    max_obs_per_feature: int = 7  # window_size+1
    keyframe_parallax_px: float = 10.0
    # failure detection thresholds (reference estimator.cpp:1076-1122)
    fail_ba_norm: float = 2.5
    fail_bg_norm: float = 1.0
    fail_trans_jump: float = 10.0
    fail_z_jump: float = 1.0
    dtype: str = "float32"        # compute dtype on device
    solver_dtype: str = "float32"  # normal-equation solve dtype


@dataclass(frozen=True)
class LidarConfig:
    """LiDAR front end + scan-to-scan constraint (reference yaml:120-140,
    vils_estimator/src/estimator.cpp:122-504, lidar_compensator)."""

    n_rings: int = 16
    scan_period: float = 0.1
    # infer sweep-start azimuth from scan history instead of assuming 0
    # (reference lidar_compensator infer_start_ori_ param)
    infer_start_ori: bool = False
    min_distance: float = 0.5
    max_distance: float = 70.0
    leaf_size: float = 0.3        # voxel downsample for scan-to-scan
    vgicp_resolution: float = 0.5
    max_corr_dist: float = 0.8
    transformation_epsilon: float = 0.0005
    vgicp_iters: int = 12
    max_points: int = 32768       # static padded point capacity per sweep
    max_voxels: int = 16384       # static voxel-hash capacity
    # spatial-hash table sizes, right-sized to the sweep scale: a 14k-pt
    # sweep at 0.5 m leaves occupies ~5-10k voxels, so 2^16 buckets keep
    # the load factor ≤0.15 while the per-sweep Gaussian-map build (scatter
    # + whole-table closed-form eigen pass) runs 4x less device work than
    # the former hardwired 2^18
    vgicp_table_size: int = 1 << 16
    downsample_table_size: int = 1 << 16
    # LiDAR-IMU extrinsic (ground truth init; reference yaml gt_rli/gt_tli)
    rlb: Tuple[float, ...] = (
        -0.0320631, 0.000946093, -0.999485,
        -0.999482, -0.00274554, 0.0320604,
        -0.0027138, 0.999996, 0.00103363,
    )
    tlb: Tuple[float, ...] = (0.2, -0.005, -0.1)
    use_estimated_extrinsic: bool = False   # reference #define USE_ES
    plb_upper: Tuple[float, ...] = (0.15, 0.03, -0.10)
    plb_lower: Tuple[float, ...] = (0.08, -0.03, -0.17)
    # constraint-mode classification thresholds
    # (reference estimator.cpp:324-436)
    fitness_fail: float = 1.0
    zero_velocity_trans: float = 0.02
    pure_rotation_yaw: float = 0.5
    drift_trans: float = 0.5
    max_constraints: int = 5       # reference ≤5-element constraint list
    add_lidar2cam: bool = True
    add_lidar2lidar: bool = True


@dataclass(frozen=True)
class LocalMappingConfig:
    """LOAM scan-to-map local mapping (reference: lidar_mapping/src/
    localMapping.cpp, scanRegistration.cpp)."""

    cube_size: Tuple[float, ...] = (10.0, 10.0, 5.0)
    cube_grid: Tuple[int, ...] = (11, 11, 7)
    submap_halo: Tuple[int, ...] = (2, 2, 1)   # 5x5x3 neighborhood
    corner_leaf: float = 0.2
    surf_leaf: float = 0.4
    outer_iters: int = 2
    gn_iters: int = 4
    edge_sharp_per_region: int = 3
    edge_less_sharp_per_region: int = 30
    flat_per_region: int = 4
    n_subregions: int = 8
    curvature_threshold: float = 0.1
    max_corner_points: int = 8192
    max_surf_points: int = 16384
    submap_trigger_dist: float = 2.0
    submap_trigger_frames: int = 30
    knn_edge: int = 5
    knn_surf: int = 10
    # carry per-point reflectivity: diff_i feature mask + intensity-similar
    # surf selection (reference scanRegistration.cpp:575-614,
    # localMapping.cpp:697-709)
    use_intensity: bool = False
    # spatial-hash size for rolling-map re-voxelization (up to ~64k pts
    # through the surf insert; 2^17 keeps the load factor ≤0.5)
    downsample_table_size: int = 1 << 17
    map_crop_radius: float = 60.0


@dataclass(frozen=True)
class GlobalMappingConfig:
    """Pose-graph + loop closure back end (reference: lidar_mapping/src/
    globalMappingIkdTree.cpp, include/global_mapping/util.h:74-88,
    scancontext/Scancontext.h:82-97)."""

    check_loop_closure: bool = True
    translation_threshold: float = 1.0
    poses_before_reclosing: int = 10
    max_tolerable_fitness: float = 1.0
    proximity_threshold: float = 5.0
    skip_recent_poses: int = 10
    floor_height: float = 3.0
    # ScanContext
    sc_num_ring: int = 20
    sc_num_sector: int = 60
    sc_max_radius: float = 80.0
    sc_dist_threshold: float = 0.3
    sc_num_candidates: int = 10
    sc_num_exclude_recent: int = 30
    # pose-graph solver
    pg_max_poses: int = 1024
    pg_iters: int = 20
    map_voxel_size: float = 0.4
    map_capacity: int = 1 << 20
    # graph capacities (None -> module defaults 512/2048/512); the CG
    # solver (pose_graph.solve_cg) is linear in these, so they are budget
    # knobs rather than memory walls
    pg_n_max: Optional[int] = None
    pg_e_max: Optional[int] = None
    pg_z_max: Optional[int] = None
    # per-LM-step CG iterations of the matrix-free solve
    pg_cg_iters: int = 64
    # consecutive-node z change that triggers a graph re-solve (the
    # reference's ikd-tree rebuild on floor transitions,
    # globalMappingIkdTree.cpp:290-298)
    z_refresh_jump: float = 0.5


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout for distributed BA / map sharding (no reference
    analog — reference uses ROS pub/sub on one host; SURVEY.md §2.6)."""

    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("kf",)
    shard_features: bool = True
    shard_map_blocks: bool = True


@dataclass(frozen=True)
class SystemConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    estimator: EstimatorConfig = field(default_factory=EstimatorConfig)
    lidar: LidarConfig = field(default_factory=LidarConfig)
    local_mapping: LocalMappingConfig = field(default_factory=LocalMappingConfig)
    global_mapping: GlobalMappingConfig = field(default_factory=GlobalMappingConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    @staticmethod
    def from_dict(d: dict) -> "SystemConfig":
        def build(cls, sub: dict):
            names = {f.name: f for f in dataclasses.fields(cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in names:
                    raise KeyError(f"unknown config key {cls.__name__}.{k}")
                f = names[k]
                if dataclasses.is_dataclass(f.type) or (
                    isinstance(f.type, str) and f.type.endswith("Config")
                ):
                    sub_cls = _CONFIG_CLASSES[f.type if isinstance(f.type, str) else f.type.__name__]
                    kwargs[k] = build(sub_cls, v)
                else:
                    kwargs[k] = _freeze(v)
            return cls(**kwargs)

        return build(SystemConfig, d)

    @staticmethod
    def from_json(path: str) -> "SystemConfig":
        with open(path) as f:
            return SystemConfig.from_dict(json.load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def replace(self, **kwargs) -> "SystemConfig":
        return dataclasses.replace(self, **kwargs)


_CONFIG_CLASSES: dict[str, Any] = {
    "CameraConfig": CameraConfig,
    "TrackerConfig": TrackerConfig,
    "ImuConfig": ImuConfig,
    "EstimatorConfig": EstimatorConfig,
    "LidarConfig": LidarConfig,
    "LocalMappingConfig": LocalMappingConfig,
    "GlobalMappingConfig": GlobalMappingConfig,
    "ParallelConfig": ParallelConfig,
}

DEFAULT_CONFIG = SystemConfig()
