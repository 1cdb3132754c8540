"""TPU-native LiDAR SLAM framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of kaushik884/LiDAR-SLAM-from-scratch
(C++17 / Eigen / GTSAM / ROS2), re-designed TPU-first: the entire per-scan
pipeline — voxel downsample, PCA normals, point-to-plane ICP, Scan Context,
two-stage loop closure, SE(3) pose-graph Levenberg-Marquardt — runs as
jit-compiled fixed-shape XLA programs over padded point clouds.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    ICPConfig,
    LoopClosureConfig,
    OccupancyGridConfig,
    PoseGraphConfig,
    ScanContextConfig,
    SlamConfig,
    tiny_config,
)
from .types import ICPResult, PointCloud  # noqa: F401
