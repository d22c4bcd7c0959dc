"""Scheimpflug (tilted-sensor) camera model wrapping a pinhole base camera
(reference: include/calib/models/scheimpflug.h, math in doc/schempflug.md).

Flat packing appends the two tilt angles to the base camera's parameters
(scheimpflug.h:234-261): ``[...pinhole(10), tau_x, tau_y]`` — 12 params.

The reference's ``unproject`` references a trait method name that does not
exist (``apply_intrinsics_linear``, scheimpflug.h:222) and builds the sensor
rotation with a different (but algebraically identical, Ry*Rx) construction;
here both paths share one rotation builder and the documented linear-shift
math, fixing that latent inconsistency deliberately (SURVEY.md section 2 L1
caveats).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import pinhole
from ..ops import fmath

PARAM_COUNT = pinhole.PARAM_COUNT + 2
IDX_TAU_X = pinhole.PARAM_COUNT
IDX_TAU_Y = pinhole.PARAM_COUNT + 1
IDX_FX, IDX_FY, IDX_SKEW = pinhole.IDX_FX, pinhole.IDX_FY, pinhole.IDX_SKEW


def base_of(intr):
    return intr[..., : pinhole.PARAM_COUNT]


def pack(base_intr, tau_x, tau_y):
    tau = jnp.stack([jnp.asarray(tau_x), jnp.asarray(tau_y)], axis=-1)
    return jnp.concatenate([base_intr, tau], axis=-1)


def _sensor_rotation(intr):
    """R = Ry(tau_y) * Rx(tau_x); columns are the tilted-sensor basis
    (axis, base, normal) — scheimpflug.h:150-152 writes this product out
    element-wise; the unproject path (scheimpflug.h:206-210) forms the same
    product explicitly."""
    tx = intr[..., IDX_TAU_X]
    ty = intr[..., IDX_TAU_Y]
    sx, cx = fmath.sincos(tx)
    sy, cy = fmath.sincos(ty)
    return jnp.stack(
        [
            jnp.stack([cy, sx * sy, cx * sy], -1),
            jnp.stack([jnp.zeros_like(cx), cx, -sx], -1),
            jnp.stack([-sy, sx * cy, cx * cy], -1),
        ],
        axis=-2,
    )


def _principal_intersection(rot):
    """(mx0, my0): principal ray's hit point on the tilted plane."""
    axis_z = rot[..., 2, 0]
    base_z = rot[..., 2, 1]
    normal_z = rot[..., 2, 2]
    return axis_z / normal_z, base_z / normal_z


def project(intr, xyz):
    """3D camera-frame point -> pixel (scheimpflug.h:139-181)."""
    rot = _sensor_rotation(intr)
    axis = rot[..., :, 0]
    base = rot[..., :, 1]
    normal = rot[..., :, 2]

    sden = jnp.sum(normal * xyz, axis=-1)
    mx = jnp.sum(axis * xyz, axis=-1) / sden
    my = jnp.sum(base * xyz, axis=-1) / sden
    mx0, my0 = _principal_intersection(rot)

    dxy = jnp.stack([mx - mx0, my - my0], axis=-1)
    px_delta = pinhole.project_normalized(base_of(intr), dxy)
    base_shift = pinhole.apply_linear_intrinsics(base_of(intr), jnp.stack([mx0, my0], -1))
    return px_delta + base_shift


def unproject(intr, pixel):
    """Pixel -> tilted-sensor plane coordinates (scheimpflug.h:196-230,
    with the documented linear-shift fix)."""
    rot = _sensor_rotation(intr)
    mx0, my0 = _principal_intersection(rot)
    base_shift = pinhole.apply_linear_intrinsics(base_of(intr), jnp.stack([mx0, my0], -1))
    dxy = pinhole.unproject(base_of(intr), pixel - base_shift)
    return jnp.stack([dxy[..., 0] + mx0, dxy[..., 1] + my0], axis=-1)


def unproject_normalized(intr, pixel):
    """Pixel -> z=1 normalized camera-frame coordinates (ray / ray_z).

    ``unproject`` returns TILTED-SENSOR-plane coordinates (mx, my) whose 3D
    ray is ``mx*axis + my*base + normal`` — NOT the (x, y, 1) ray that
    (mx, my, 1) would suggest. Model-generic geometry (the line-scan
    target-pose/laser triangulation, linescan.h:66-69, 84) needs the z=1
    representation, so this composes the plane coords with
    :func:`plane_point_to_ray` and dehomogenizes.
    """
    ray = plane_point_to_ray(intr, unproject(intr, pixel))
    return ray[..., :2] / ray[..., 2:3]


def apply_intrinsics(intr, pixel):
    return pinhole.apply_intrinsics(base_of(intr), pixel)


def remove_intrinsics(intr, xy):
    return pinhole.remove_intrinsics(base_of(intr), xy)


def plane_point_to_ray(intr, mxy):
    """Tilted-plane coordinates -> 3D ray direction in the camera frame.

    Inverse of the ray/plane intersection used by :func:`project`; useful for
    full pixel->ray unprojection in the line-scan path.
    """
    rot = _sensor_rotation(intr)
    axis = rot[..., :, 0]
    base = rot[..., :, 1]
    normal = rot[..., :, 2]
    # X on plane with (axis.X, base.X, normal.X) = (mx*s, my*s, s); choose s=1
    return mxy[..., 0:1] * axis + mxy[..., 1:2] * base + normal
