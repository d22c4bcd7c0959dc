from . import (
    extrinsics_linear,
    handeye_linear,
    homography,
    intrinsics_linear,
    linalg,
    linescan,
    planarpose,
    planefit,
    ransac,
    se3,
    zhang,
)

__all__ = [
    "se3",
    "linalg",
    "homography",
    "planarpose",
    "zhang",
    "intrinsics_linear",
    "handeye_linear",
    "planefit",
    "extrinsics_linear",
    "linescan",
    "ransac",
]
