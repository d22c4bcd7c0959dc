from . import blocks, bundle, core, extrinsics, handeye, homography, intrinsics, lm, lm_schur, manifold, planarpose, semidlt
from .bundle import BundleOptions, BundleResult, optimize_bundle, optimize_bundle_device
from .core import OptimOptions, OptimResult, OptimizerType, TerminationType
from .extrinsics import ExtrinsicOptions, ExtrinsicOptimizationResult, optimize_extrinsics, optimize_extrinsics_device
from .handeye import HandeyeResult, estimate_and_optimize_handeye, optimize_handeye, optimize_handeye_device
from .homography import OptimizeHomographyResult, optimize_homography, optimize_homography_device
from .intrinsics import (
    IntrinsicsOptimOptions,
    IntrinsicsOptimizationResult,
    optimize_intrinsics,
    optimize_intrinsics_device,
)
from .lm import LMOutput, covariance, lm_core
from .lm_schur import SchurOutput, lm_core_schur
from .manifold import ProductManifold, euclid, quat
from .planarpose import PlanarPoseOptions, PlanarPoseResult, optimize_planar_pose, optimize_planar_pose_device
from .semidlt import SemiDltResult, optimize_intrinsics_semidlt, optimize_intrinsics_semidlt_device

__all__ = [
    "core", "lm", "manifold", "blocks",
    "homography", "planarpose", "intrinsics", "semidlt", "extrinsics", "handeye", "bundle",
    "OptimOptions", "OptimResult", "OptimizerType", "TerminationType",
    "lm_core", "covariance", "LMOutput", "ProductManifold", "euclid", "quat",
    "lm_schur", "lm_core_schur", "SchurOutput",
    "optimize_homography", "optimize_homography_device", "OptimizeHomographyResult",
    "optimize_planar_pose", "optimize_planar_pose_device", "PlanarPoseOptions", "PlanarPoseResult",
    "optimize_intrinsics", "optimize_intrinsics_device", "IntrinsicsOptimOptions", "IntrinsicsOptimizationResult",
    "optimize_intrinsics_semidlt", "optimize_intrinsics_semidlt_device", "SemiDltResult",
    "optimize_extrinsics", "optimize_extrinsics_device", "ExtrinsicOptions", "ExtrinsicOptimizationResult",
    "optimize_handeye", "optimize_handeye_device", "estimate_and_optimize_handeye", "HandeyeResult",
    "optimize_bundle", "optimize_bundle_device", "BundleOptions", "BundleResult",
]
