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


def project_point_jacobians(intr, xyz):
    """Analytic per-point Jacobians of ``project`` — the hand-derived chain
    rule of denormalize(distort(hnormalized(xyz))) (pinhole.h:102-107 /
    distortion.h:93-116), available to the LM engines in place of a
    jacfwd tangent sweep (~1/16 the arithmetic, though jacfwd measures
    faster on TPU v5e where tangent propagation rides the MXU — see
    parallel/batched.py::ANALYTIC_JAC_MAX_BATCH).

    intr: (10,); xyz: (N, 3) camera-frame points. Returns
    (j_intr (N, 2, 10), h (N, 2, 3)) with j_intr = d(u, v)/d intr in the
    CameraTraits packing order and h = d(u, v)/d xyz. Equivalence vs jacfwd
    is asserted in tests/test_lm_solvers.py.
    """
    iz = 1.0 / xyz[..., 2]
    x = xyz[..., 0] * iz
    y = xyz[..., 1] * iz

    fx, fy, sk = intr[0], intr[1], intr[4]
    k1, k2, k3, p1, p2 = intr[5], intr[6], intr[7], intr[8], intr[9]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    drad = k1 + 2.0 * k2 * r2 + 3.0 * k3 * r4
    xy = x * y
    xd = x * rad + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy

    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)

    # d(xd, yd)/d(coeff) (distortion.h:93-116)
    dxd_k = (x * r2, x * r4, x * r6, 2.0 * xy, r2 + 2.0 * x * x)
    dyd_k = (y * r2, y * r4, y * r6, r2 + 2.0 * y * y, 2.0 * xy)

    cols = [
        jnp.stack([xd, z], -1),  # fx
        jnp.stack([z, yd], -1),  # fy
        jnp.stack([o, z], -1),  # cx
        jnp.stack([z, o], -1),  # cy
        jnp.stack([yd, z], -1),  # skew
    ]
    for dx_c, dy_c in zip(dxd_k, dyd_k):
        cols.append(jnp.stack([fx * dx_c + sk * dy_c, fy * dy_c], -1))
    j_intr = jnp.stack(cols, axis=-1)  # (N, 2, 10)

    # G = d(u, v)/d(x, y) = [[fx, sk], [0, fy]] @ d(xd, yd)/d(x, y);
    # d yd/dx == d xd/dy by symmetry of the Brown-Conrady model
    dxdx = rad + 2.0 * x * x * drad + 2.0 * p1 * y + 6.0 * p2 * x
    dxdy = 2.0 * xy * drad + 2.0 * p1 * x + 2.0 * p2 * y
    dydy = rad + 2.0 * y * y * drad + 6.0 * p1 * y + 2.0 * p2 * x
    g00 = fx * dxdx + sk * dxdy
    g01 = fx * dxdy + sk * dydy
    g10 = fy * dxdy
    g11 = fy * dydy

    # H = G @ d(x, y)/d xyz, with d(x, y)/d xyz = [[iz, 0, -x iz], [0, iz, -y iz]]
    h = jnp.stack(
        [
            jnp.stack([g00 * iz, g01 * iz, -(g00 * x + g01 * y) * iz], -1),
            jnp.stack([g10 * iz, g11 * iz, -(g10 * x + g11 * y) * iz], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    return j_intr, h


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
