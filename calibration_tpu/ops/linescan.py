"""Line-scan laser-plane calibration: lift laser pixels through per-view
target homographies into 3D, then fit a plane (reference:
include/calib/estimation/linear/linescan.h).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from . import linalg

from . import homography as H
from . import planarpose, planefit, se3


def build_plane_homography(plane):
    """Plane-basis inverse map (linescan.h:49-61). plane: (4,) -> (3, 3)."""
    nvec = plane[:3]
    p0 = -plane[3] * nvec
    use_z = jnp.abs(nvec[2]) < 0.9
    tmp = jnp.where(use_z, jnp.array([0.0, 0.0, 1.0], plane.dtype), jnp.array([1.0, 0.0, 0.0], plane.dtype))
    e1 = jnp.cross(nvec, tmp)
    e1 = e1 / jnp.linalg.norm(e1)
    e2 = jnp.cross(nvec, e1)
    e2 = e2 / jnp.linalg.norm(e2)
    plane_to_norm = jnp.stack([e1, e2, p0], axis=-1)
    return linalg.inv3(plane_to_norm)


def points_from_view(obj_xy, target_norm_uv, laser_norm_uv, target_mask=None):
    """Lift laser pixels (already unprojected to normalized coords by the
    camera model, incl. distortion) to 3D camera-frame points on the target
    plane (linescan.h:63-91).

    obj_xy: (N, 2); target_norm_uv: (N, 2); laser_norm_uv: (L, 2).
    Returns (points (L, 3), ok).
    """
    hm = H.estimate_homography_dlt(obj_xy, target_norm_uv, target_mask)
    ok = jnp.all(jnp.isfinite(hm))
    pose = planarpose.pose_from_homography_normalized(hm)
    h_norm_to_obj = linalg.inv3(hm)
    h22 = h_norm_to_obj[2, 2]
    h_norm_to_obj = jnp.where(jnp.abs(h22) > 1e-15, h_norm_to_obj / h22, h_norm_to_obj)

    plane_xy = H.apply_homography(h_norm_to_obj, laser_norm_uv)  # (L, 2)
    obj_pts = jnp.concatenate([plane_xy, jnp.zeros_like(plane_xy[..., :1])], axis=-1)
    cam_pts = se3.se3_apply(pose[None], obj_pts)
    return cam_pts, ok


class LineScanResult(NamedTuple):
    plane: jnp.ndarray  # (4,)
    covariance: jnp.ndarray  # (4, 4) zero (parity: linescan.h:142)
    homography: jnp.ndarray  # (3, 3)
    rms_error: jnp.ndarray
    inlier_count: jnp.ndarray
    ok: jnp.ndarray


def calibrate_laser_plane(
    obj_xy, target_norm_uv, laser_norm_uv, target_mask=None, laser_mask=None
):
    """SVD-fit path of the laser-plane calibration (linescan.h:101-146).

    obj_xy/target_norm_uv: (V, N, 2); laser_norm_uv: (V, L, 2); masks optional.
    Image/laser coordinates must already be unprojected through the camera
    (the facade does that, matching points_from_view's camera.unproject calls).
    The RANSAC path is composed at the facade level via ops.ransac.plane.
    """
    v = obj_xy.shape[0]
    pts, ok_views = jax.vmap(points_from_view)(obj_xy, target_norm_uv, laser_norm_uv, target_mask)
    pts = pts.reshape(-1, 3)
    if laser_mask is None:
        lm = jnp.ones(laser_norm_uv.shape[:-1], bool)
    else:
        lm = laser_mask
    lm = lm & ok_views[:, None]
    lm_flat = lm.reshape(-1)

    plane = planefit.fit_plane_svd(pts, lm_flat)
    rms = planefit.plane_rms(plane, pts, lm_flat)
    hm = build_plane_homography(plane)
    count = jnp.sum(lm_flat)
    ok = jnp.all(ok_views) & (count >= 3)
    return LineScanResult(plane, jnp.zeros((4, 4), plane.dtype), hm, rms, count, ok), pts, lm_flat
