"""SO(3)/SE(3) utilities — batched, autodiff-safe jnp re-design of the
reference Eigen helpers (reference: include/calib/estimation/common/se3_utils.h).

Poses are represented as 4x4 homogeneous matrices ("se3"); rotations as 3x3
matrices; quaternions as (w, x, y, z) to match the reference's Eigen/Ceres
convention (src/estimation/detail/observationutils.h:22-27).

All functions broadcast over leading batch dimensions and are safe under
``jax.jacfwd``/``grad`` at the singular points (theta -> 0 and theta -> pi)
via Taylor-guarded branches — the reference's naive ``log_so3``
(se3_utils.h:27-40) is undefined at pi; we use the quaternion route instead,
which agrees elsewhere and is differentiable at the identity (needed because
the AX=XB rotation residual vanishes at the optimum).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fmath

_EPS = 1e-12


def skew(v):
    """Skew-symmetric matrix [v]_x; v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def project_to_so3(m):
    """Closest rotation via SVD polar decomposition (se3_utils.h:10-19)."""
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(m.shape[:-2] + (3,), m.dtype)
    d = d.at[..., 2].set(jnp.sign(jnp.where(det == 0, 1.0, det)))
    return (u * d[..., None, :]) @ vt


def exp_so3(w):
    """Rodrigues exp map, Taylor-safe near zero (se3_utils.h:42-51)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-16
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks
    sin_t, cos_t = fmath.sincos(theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, sin_t / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / theta2_safe)
    k = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def rotmat_to_quat(r):
    """Rotation matrix -> unit quaternion (w,x,y,z), branchless/batched.

    Uses the classic four-candidate construction selecting the largest
    denominator, robust for all rotations including theta ~ pi.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate 0: trace
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # candidate 1: m00 largest
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # candidate 2: m11 largest
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # candidate 3: m22 largest
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix. Normalizes the input so
    it can be used directly on raw optimizer parameter blocks (the reference
    normalizes via Eigen's ``toRotationMatrix`` after ``normalize()``)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return r


def quat_conj(q):
    """Quaternion conjugate (w,x,y,z) -> (w,-x,-y,-z)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a, b):
    """Hamilton product of (w,x,y,z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def log_so3(r):
    """SO(3) log map -> axis-angle 3-vector, via the quaternion route.

    Differentiable at the identity (Taylor) and well-defined near pi, unlike
    the reference's sin-based formula (se3_utils.h:27-40) which it otherwise
    matches to machine precision.
    """
    q = rotmat_to_quat(r)
    w = q[..., 0]
    v = q[..., 1:]
    # enforce w >= 0 (angle in [0, pi])
    sgn = jnp.where(w < 0, -1.0, 1.0)
    w = w * sgn
    v = v * sgn[..., None]
    s2 = jnp.sum(v * v, axis=-1)
    small = s2 < 1e-16
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    angle = 2.0 * fmath.atan2(s, w)
    # factor = angle / s;  Taylor: 2/w * (1 - s^2/(3 w^2))
    factor = jnp.where(small, 2.0 / jnp.maximum(w, _EPS) * (1.0 - s2 / (3.0 * jnp.maximum(w * w, _EPS))), angle / s)
    return v * factor[..., None]


def exp_quat(w):
    """Axis-angle 3-vector -> unit quaternion (w,x,y,z), Taylor-safe."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-16
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    sin_h, cos_h = fmath.sincos(half)
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, sin_h / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, cos_h)
    return jnp.concatenate([cw[..., None], w * sinc_half[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# SE(3) as 4x4 homogeneous matrices
# ---------------------------------------------------------------------------

def make_se3(r, t):
    """(...,3,3), (...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], r.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_identity(dtype=jnp.float64):
    return jnp.eye(4, dtype=dtype)


def rot(m):
    return m[..., :3, :3]


def tra(m):
    return m[..., :3, 3]


def se3_inverse(m):
    rt = jnp.swapaxes(rot(m), -1, -2)
    return make_se3(rt, -jnp.einsum("...ij,...j->...i", rt, tra(m)))


def se3_apply(m, p):
    """Apply pose to points p: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", rot(m), p) + tra(m)


def se3_exp(w6):
    """Tangent (omega, v) -> SE(3) (rotation exp; translation stored directly,
    matching the reference's angle-axis+translation 'pose6' packing,
    src/estimation/detail/observationutils.h:76-84)."""
    return make_se3(exp_so3(w6[..., :3]), w6[..., 3:])


def se3_log(m):
    return jnp.concatenate([log_so3(rot(m)), tra(m)], axis=-1)


def average_isometries(poses, mask=None):
    """Quaternion sign-aligned average of SE(3) poses (se3_utils.h:75-95).

    poses: (K, 4, 4); mask: optional (K,) validity weights. Quaternions are
    sign-aligned against the first valid pose (the reference aligns against a
    running sum; identical for clustered rotations).
    """
    q = rotmat_to_quat(rot(poses))
    t = tra(poses)
    if mask is None:
        mask = jnp.ones(poses.shape[0], poses.dtype)
    mask = mask.astype(poses.dtype)
    # select, not just weight: a masked-out pose can be NaN (degenerate
    # padded view) and NaN * 0 = NaN would poison the sums (same bug class
    # as zhang_design_matrix row masking)
    q = jnp.where(mask[:, None] > 0, q, jnp.array([1.0, 0, 0, 0], poses.dtype))
    t = jnp.where(mask[:, None] > 0, t, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    ref_idx = jnp.argmax(mask)
    q_ref = q[ref_idx]
    sgn = jnp.where(jnp.sum(q * q_ref, axis=-1) < 0, -1.0, 1.0)
    q_sum = jnp.sum(q * sgn[:, None] * mask[:, None], axis=0)
    nrm = jnp.linalg.norm(q_sum)
    q_avg = jnp.where(nrm > _EPS, q_sum / jnp.maximum(nrm, _EPS), jnp.array([1.0, 0, 0, 0], poses.dtype))
    t_avg = jnp.sum(t * mask[:, None], axis=0) / denom
    return make_se3(quat_to_rotmat(q_avg), t_avg)


def pose_to_array(m):
    """SE(3) -> pose6 [axis-angle, t] (se3_utils.h:65-73)."""
    return se3_log(m)


def array_to_pose(p6):
    return se3_exp(p6)
