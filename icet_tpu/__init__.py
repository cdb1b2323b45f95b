"""ICET-TPU: a TPU-native LiDAR odometry + HD-mapping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mcdermatt/ICET
(Iterative Closest Ellipsoidal Transform): distribution-to-distribution
point-cloud registration with spherical shadow-mitigation voxels, per-voxel
and global ambiguity suppression, and closed-form predicted solution error
covariance — plus the odometry, HD-map accumulation, dataset replay, and
robustness-filter layers that sit around the solver.
"""

from icet_tpu.config import (
    BlockMapConfig,
    ICETConfig,
    KeyframeConfig,
    MapConfig,
    OdometryConfig,
    PROFILES,
)
from icet_tpu.filters import register_scans
from icet_tpu.keyframe import BlockMap, KeyframeOdometry
from icet_tpu.mapping import MapMaker
from icet_tpu.odometry import (
    OdometryPipeline,
    run_odometry,
    run_odometry_device,
)
from icet_tpu.scan_matcher import ScanMatcher
from icet_tpu.solver import (
    RegistrationResult,
    VoxelModel,
    odometry_step_jit,
    prepare_reference,
    prepare_reference_jit,
    register,
    register_jit,
    register_pair,
)

__version__ = "0.3.0"

__all__ = [
    "BlockMap",
    "BlockMapConfig",
    "ICETConfig",
    "KeyframeConfig",
    "KeyframeOdometry",
    "MapMaker",
    "OdometryPipeline",
    "run_odometry",
    "run_odometry_device",
    "MapConfig",
    "OdometryConfig",
    "PROFILES",
    "RegistrationResult",
    "ScanMatcher",
    "VoxelModel",
    "odometry_step_jit",
    "prepare_reference",
    "prepare_reference_jit",
    "register",
    "register_jit",
    "register_pair",
    "register_scans",
]
