"""Camera model registry — the functional replacement for the reference's
C++20 ``camera_model`` concept + ``CameraTraits`` packing
(include/calib/models/cameramodel.h:29-64).

A model is a named bundle of pure functions over a flat parameter vector;
solvers are generic over the spec, mirroring the reference's
``optimize_intrinsics<CameraT>`` templates, and the flat packing matches the
reference traits so covariance layouts line up.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from . import pinhole, scheimpflug


@dataclasses.dataclass(frozen=True)
class CameraModelSpec:
    name: str
    param_count: int
    idx_fx: int
    idx_fy: int
    idx_skew: int
    # start of the Brown-Conrady distortion vector [k1, k2, k3, p1, p2] in
    # the flat packing (CameraTraits order, pinhole.h:120-122: distortion
    # follows [fx, fy, cx, cy, skew]); fixed_distortion_indices are relative
    # to this vector (reference intrinsics.h:18-19 semantics)
    idx_dist0: int
    project: Callable  # (intr, xyz[...,3]) -> uv[...,2]
    unproject: Callable  # (intr, uv[...,2]) -> model-native xy[...,2]
    apply_intrinsics: Callable  # pixel -> normalized
    remove_intrinsics: Callable  # normalized -> pixel
    # pixel -> z=1 normalized camera-frame xy (ray/ray_z) — the
    # model-GENERIC representation for 3D geometry (line-scan, plane
    # fitting). Identical to ``unproject`` for pinhole; for tilted-sensor
    # models ``unproject`` is in sensor-plane coords and this converts
    # through the ray (scheimpflug.unproject_normalized docstring).
    unproject_normalized: Callable


PINHOLE = CameraModelSpec(
    name="pinhole_brown_conrady",
    param_count=pinhole.PARAM_COUNT,
    idx_fx=pinhole.IDX_FX,
    idx_fy=pinhole.IDX_FY,
    idx_skew=pinhole.IDX_SKEW,
    idx_dist0=pinhole.IDX_SKEW + 1,
    project=pinhole.project,
    unproject=pinhole.unproject,
    apply_intrinsics=pinhole.apply_intrinsics,
    remove_intrinsics=pinhole.remove_intrinsics,
    unproject_normalized=pinhole.unproject,
)

SCHEIMPFLUG = CameraModelSpec(
    name="scheimpflug_pinhole_brown_conrady",
    param_count=scheimpflug.PARAM_COUNT,
    idx_fx=scheimpflug.IDX_FX,
    idx_fy=scheimpflug.IDX_FY,
    idx_skew=scheimpflug.IDX_SKEW,
    idx_dist0=scheimpflug.IDX_SKEW + 1,
    project=scheimpflug.project,
    unproject=scheimpflug.unproject,
    apply_intrinsics=scheimpflug.apply_intrinsics,
    remove_intrinsics=scheimpflug.remove_intrinsics,
    unproject_normalized=scheimpflug.unproject_normalized,
)

MODELS = {m.name: m for m in (PINHOLE, SCHEIMPFLUG)}
# Short aliases used by configs.
MODELS["pinhole"] = PINHOLE
MODELS["scheimpflug"] = SCHEIMPFLUG


def get_model(name: str) -> CameraModelSpec:
    try:
        return MODELS[name]
    except KeyError:
        raise KeyError(f"Unknown camera model '{name}'; known: {sorted(MODELS)}") from None
