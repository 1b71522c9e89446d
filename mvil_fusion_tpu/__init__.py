"""mvil_fusion_tpu — a TPU-native visual-inertial-LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Stan994265/mVIL-Fusion (ROS1 C++): KLT visual front end with LiDAR-aided
feature depth, IMU preintegration, sliding-window visual-inertial bundle
adjustment with Schur-complement marginalization, VGICP scan-to-scan LiDAR
constraints with zero-velocity / pure-rotation handling, LOAM scan-to-map
local mapping on a rolling voxel map, and a global pose-graph back end with
ScanContext loop closure — implemented as jitted fixed-shape kernels with
keyframe/map sharding over TPU device meshes.
"""

__version__ = "0.1.0"

from mvil_fusion_tpu.config import (  # noqa: F401
    DEFAULT_CONFIG,
    CameraConfig,
    EstimatorConfig,
    GlobalMappingConfig,
    ImuConfig,
    LidarConfig,
    LocalMappingConfig,
    ParallelConfig,
    SystemConfig,
    TrackerConfig,
)
