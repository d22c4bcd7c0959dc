"""Planar pose from homography decomposition (reference:
src/estimation/linear/planarpose_linear.cpp, include/calib/estimation/linear/planarpose.h).
"""

from __future__ import annotations

import jax.numpy as jnp
from . import linalg

from ..models import camera_matrix as cm
from . import homography as H
from . import se3


def pose_from_homography_normalized(hmtx):
    """Decompose normalized-coords homography H = [r1 r2 t]
    (planarpose_linear.cpp:17-52). hmtx: (..., 3, 3) -> (..., 4, 4).

    Sign disambiguation: H is only defined up to sign; the physical solution
    has the target origin in front of the camera (t_z > 0). The negation is
    applied to (h1, h2, h3) BEFORE forming r3 = r1 x r2 so the result stays a
    proper rotation — the reference instead negates the finished rotation
    matrix when R(2,2) < 0 (planarpose_linear.cpp:47-50), which produces a
    det = -1 reflection whenever that branch fires (a latent reference bug;
    its test geometries never trigger it — SURVEY.md section 7 hard parts).
    """
    # resolve the sign ambiguity first: t_z = h3_z / s must be positive
    sign = jnp.where(hmtx[..., 2, 2] < 0, -1.0, 1.0)
    hm = hmtx * sign[..., None, None]
    h1 = hm[..., :, 0]
    h2 = hm[..., :, 1]
    h3 = hm[..., :, 2]
    s = jnp.sqrt(jnp.linalg.norm(h1, axis=-1) * jnp.linalg.norm(h2, axis=-1))
    s = jnp.where(s < 1e-12, 1.0, s)
    r1 = h1 / s[..., None]
    r2 = h2 / s[..., None]
    r3 = jnp.cross(r1, r2)
    r_init = jnp.stack([r1, r2, r3], axis=-1)

    # SVD orthonormalization with det fix (planarpose_linear.cpp:36-45)
    u, _, vt = jnp.linalg.svd(r_init)
    rot = u @ vt
    det = jnp.linalg.det(rot)
    v_fix = vt.at[..., 2, :].multiply(-1.0)
    rot = jnp.where((det < 0)[..., None, None], u @ v_fix, rot)

    t = h3 / s[..., None]
    return se3.make_se3(rot, t)


def estimate_planar_pose_normalized(obj_xy, norm_uv, mask=None):
    """DLT on already-normalized image coords + decomposition (the generic
    camera_model overload, planarpose.h:38-110)."""
    h = H.estimate_homography_dlt(obj_xy, norm_uv, mask)
    return pose_from_homography_normalized(h)


def estimate_planar_pose(obj_xy, img_uv, kmtx, mask=None):
    """One-shot planar pose from pixel observations and K
    (planarpose_linear.cpp:54-76). obj_xy/img_uv: (..., N, 2); kmtx: (..., 5)."""
    norm_uv = cm.normalize(kmtx[..., None, :], img_uv)
    return estimate_planar_pose_normalized(obj_xy, norm_uv, mask)


def pose_from_homography_pixel(kmtx, hmtx):
    """Pixel-space homography decomposition K^-1 H with mean-column-norm
    scale and t_z > 0 enforcement (src/estimation/linear/posefromhomography.cpp:12-80).

    Returns (pose (...,4,4), scale, cond_check, ok).
    """
    kinv = linalg.inv3(cm.matrix(kmtx))
    hn = kinv @ hmtx
    n1 = jnp.linalg.norm(hn[..., :, 0], axis=-1)
    n2 = jnp.linalg.norm(hn[..., :, 1], axis=-1)
    eps = 1e-15
    ok = (n1 > eps) & (n2 > eps) & jnp.isfinite(hmtx[..., 2, 2])
    scale = 1.0 / jnp.maximum((n1 + n2) * 0.5, eps)
    cond = jnp.where(n1 > n2, n1 / jnp.maximum(n2, eps), n2 / jnp.maximum(n1, eps))

    # sign disambiguation before forming r3 (t_z > 0; same latent-reflection
    # fix as pose_from_homography_normalized — the reference negates the
    # orthonormalized rotation, posefromhomography.cpp:57-63)
    sign = jnp.where(hn[..., 2, 2] <= 0, -1.0, 1.0)
    hs = hn * sign[..., None, None]
    r1 = scale[..., None] * hs[..., :, 0]
    r2 = scale[..., None] * hs[..., :, 1]
    r3 = jnp.cross(r1, r2)
    rot = se3.project_to_so3(jnp.stack([r1, r2, r3], axis=-1))
    t = scale[..., None] * hs[..., :, 2]
    return se3.make_se3(rot, t), scale, cond, ok


def homography_consistency_fro(kmtx, pose, hmtx):
    """Relative Frobenius mismatch between K [r1 r2 t] and H
    (posefromhomography.cpp:66-79)."""
    rt = jnp.stack(
        [pose[..., :3, 0], pose[..., :3, 1], pose[..., :3, 3]], axis=-1
    )
    h_hat = cm.matrix(kmtx) @ rt
    num = jnp.linalg.norm(h_hat - hmtx, axis=(-2, -1))
    den = jnp.linalg.norm(hmtx, axis=(-2, -1))
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), jnp.inf)
