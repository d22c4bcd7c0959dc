"""Line-scan laser-plane facade (reference:
include/calib/pipeline/facades/linescan.h + src/pipeline/linescan.cpp).

The facade unprojects target and laser pixels through the full camera model
(distortion included, matching points_from_view's camera.unproject calls in
linescan.h:63-91), lifts laser points to 3D, and fits the plane by SVD or
RANSAC.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ...models.registry import PINHOLE, CameraModelSpec, get_model
from ...ops import linescan as ls
from ...ops import planefit, ransac as ransac_mod
from .intrinsics import RansacConfig


@dataclasses.dataclass
class LineScanViewData:
    """LineScanView (estimation/linear/linescan.h:16-19)."""

    obj_xy: np.ndarray  # (N, 2) target plane coords
    img_uv: np.ndarray  # (N, 2) target pixel detections
    laser_uv: np.ndarray  # (L, 2) laser line pixels


@dataclasses.dataclass
class LineScanPlaneFitOptions:
    """linescan.h:29-32."""

    use_ransac: bool = False
    ransac_options: RansacConfig = dataclasses.field(default_factory=RansacConfig)


@dataclasses.dataclass
class LinescanCalibrationOptions:
    """facades/linescan.h:28-30."""

    plane_fit: LineScanPlaneFitOptions = dataclasses.field(default_factory=LineScanPlaneFitOptions)


@dataclasses.dataclass
class LineScanCalibrationResult:
    """linescan.h:21-28."""

    plane: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(4))
    covariance: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((4, 4)))
    homography: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(3))
    rms_error: float = 0.0
    summary: str = ""
    inlier_count: int = 0


@dataclasses.dataclass
class LinescanCalibrationRunResult:
    """facades/linescan.h:20-26."""

    success: bool = False
    used_views: int = 0
    result: LineScanCalibrationResult = dataclasses.field(
        default_factory=LineScanCalibrationResult
    )


def validate_observations(views: List[LineScanViewData]) -> None:
    """linescan.h:39-47."""
    if len(views) < 2:
        raise ValueError("At least 2 views are required")
    if any(v.obj_xy.shape[0] < 4 for v in views):
        raise ValueError("Each view requires >=4 target correspondences")


class LinescanCalibrationFacade:
    """src/pipeline/linescan.cpp:12-25 — camera -> laser plane.

    Generic over the camera model, like the reference's
    ``calibrate_laser_plane`` template (estimation/linear/linescan.h:63-91
    is templated over ``camera_model``): pass ``model`` (a CameraModelSpec
    or registry name, default pinhole) and a matching flat intrinsics
    vector — a Scheimpflug line-scan rig is ``model="scheimpflug"`` with a
    12-parameter camera.
    """

    def calibrate(
        self,
        camera: np.ndarray,  # flat intrinsics (model.param_count,)
        views: List[LineScanViewData],
        opts: Optional[LinescanCalibrationOptions] = None,
        model: CameraModelSpec | str = PINHOLE,
    ) -> LinescanCalibrationRunResult:
        import jax.numpy as jnp

        opts = opts or LinescanCalibrationOptions()
        if isinstance(model, str):
            model = get_model(model)
        out = LinescanCalibrationRunResult(used_views=len(views))
        try:
            validate_observations(views)
            camera = jnp.asarray(camera)
            if camera.shape[-1] != model.param_count:
                raise ValueError(
                    f"camera has {camera.shape[-1]} params; model "
                    f"'{model.name}' expects {model.param_count}"
                )
            nt = max(v.obj_xy.shape[0] for v in views)
            nl = max(v.laser_uv.shape[0] for v in views)
            vcount = len(views)
            obj = np.zeros((vcount, nt, 2))
            tgt_uv = np.zeros((vcount, nt, 2))
            tmask = np.zeros((vcount, nt), bool)
            laser = np.zeros((vcount, nl, 2))
            lmask = np.zeros((vcount, nl), bool)
            for i, v in enumerate(views):
                k = v.obj_xy.shape[0]
                obj[i, :k] = v.obj_xy
                tgt_uv[i, :k] = v.img_uv
                tmask[i, :k] = True
                kl = v.laser_uv.shape[0]
                laser[i, :kl] = v.laser_uv
                lmask[i, :kl] = True

            # full unprojection through the camera model, distortion (and
            # sensor tilt for Scheimpflug) included (linescan.h:66-69, 84)
            tgt_norm = model.unproject_normalized(camera[None, None], jnp.asarray(tgt_uv))
            laser_norm = model.unproject_normalized(camera[None, None], jnp.asarray(laser))

            res, pts, pts_mask = ls.calibrate_laser_plane(
                jnp.asarray(obj), tgt_norm, laser_norm,
                target_mask=jnp.asarray(tmask), laser_mask=jnp.asarray(lmask),
            )
            if int(np.sum(np.asarray(pts_mask))) < 3:
                raise ValueError("Not enough laser points to fit a plane")

            r = LineScanCalibrationResult()
            if opts.plane_fit.use_ransac:
                rr = ransac_mod.ransac_plane(
                    pts, opts.plane_fit.ransac_options.to_options(), mask=pts_mask
                )
                if not bool(rr.success):
                    raise RuntimeError("RANSAC plane fitting failed")
                r.plane = np.asarray(rr.model)
                r.summary = "ransac"
                r.inlier_count = int(rr.inlier_count)
                r.rms_error = float(planefit.plane_rms(rr.model, pts, rr.inlier_mask))
                r.homography = np.asarray(ls.build_plane_homography(rr.model))
            else:
                r.plane = np.asarray(res.plane)
                r.summary = "linear_svd"
                r.inlier_count = int(res.inlier_count)
                r.rms_error = float(res.rms_error)
                r.homography = np.asarray(res.homography)
            out.result = r
            out.success = True
        except Exception:  # noqa: BLE001 — parity with the facade's catch-all
            out.success = False
        return out
