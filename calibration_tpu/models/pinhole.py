"""Pinhole camera with Brown-Conrady distortion (reference:
include/calib/models/pinhole.h).

Parameter packing matches the reference's ``CameraTraits`` flat layout
(pinhole.h:117-161): ``[fx, fy, cx, cy, skew, k1, k2, k3, p1, p2]`` — 10
parameters with 3 radial + 2 tangential distortion coefficients. All
functions take the flat vector so the LM engine differentiates straight
through the packing.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import camera_matrix as cm
from . import distortion as dist

PARAM_COUNT = 10
NUM_DIST_COEFFS = 5  # pinhole.h:124
IDX_FX, IDX_FY, IDX_SKEW = 0, 1, 4  # pinhole.h:120-122


def kmtx_of(intr):
    return intr[..., :5]


def dist_of(intr):
    return intr[..., 5:]


def pack(kmtx, coeffs):
    """Assemble the flat 10-vector; pads/truncates coeffs to 5."""
    coeffs = jnp.asarray(coeffs)
    d = coeffs.shape[-1]
    if d < NUM_DIST_COEFFS:
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, NUM_DIST_COEFFS - d)]
        # keep [k.., p1, p2] ordering: insert zeros between radial and tangential
        nrad = d - 2
        radial = coeffs[..., :nrad]
        tang = coeffs[..., nrad:]
        zeros = jnp.zeros(coeffs.shape[:-1] + (3 - nrad,), coeffs.dtype)
        coeffs = jnp.concatenate([radial, zeros, tang], axis=-1)
        del pad
    return jnp.concatenate([kmtx, coeffs], axis=-1)


def distort(intr, xy):
    return dist.apply_distortion(xy, dist_of(intr))


def undistort_pt(intr, xy):
    return dist.undistort(xy, dist_of(intr))


def apply_intrinsics(intr, pixel):
    """Pixel -> normalized (pinhole.h:72-76)."""
    return cm.normalize(kmtx_of(intr), pixel)


def remove_intrinsics(intr, xy):
    """Normalized -> pixel (pinhole.h:78-82)."""
    return cm.denormalize(kmtx_of(intr), xy)


def project(intr, xyz):
    """3D camera-frame point -> pixel (pinhole.h:102-107).

    intr: (..., 10); xyz: (..., 3).
    """
    norm = xyz[..., :2] / xyz[..., 2:3]
    return cm.denormalize(kmtx_of(intr), dist.apply_distortion(norm, dist_of(intr)))


def project_normalized(intr, xy):
    """Normalized point -> pixel (pinhole.h:96-100)."""
    return cm.denormalize(kmtx_of(intr), dist.apply_distortion(xy, dist_of(intr)))


def unproject(intr, pixel):
    """Pixel -> undistorted normalized coordinates (pinhole.h:109-113)."""
    return dist.undistort(cm.normalize(kmtx_of(intr), pixel), dist_of(intr))


def apply_linear_intrinsics(intr, xy):
    """fx/fy/skew only, NO principal point (pinhole.h:148-153).

    Used by the Scheimpflug wrapper for the principal-ray shift.
    """
    u = intr[..., 0] * xy[..., 0] + intr[..., 4] * xy[..., 1]
    v = intr[..., 1] * xy[..., 1]
    return jnp.stack([u, v], axis=-1)


def remove_linear_intrinsics(intr, uv):
    """Inverse of apply_linear_intrinsics (pinhole.h:155-160)."""
    y = uv[..., 1] / intr[..., 1]
    x = (uv[..., 0] - intr[..., 4] * y) / intr[..., 0]
    return jnp.stack([x, y], axis=-1)
