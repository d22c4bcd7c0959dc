"""Tsai-Lenz hand-eye DLT (reference: src/estimation/linear/handeyedlt.cpp).

The reference's data-dependent pair filtering (min rotation angle,
near-parallel axes) becomes a weight vector over the static all-pairs set, so
the stacked 3P x 3 ridge solves keep fixed shapes under jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import fmath, linalg, se3


class MotionPairs(NamedTuple):
    rot_a: jnp.ndarray  # (P, 3, 3)
    rot_b: jnp.ndarray  # (P, 3, 3)
    tra_a: jnp.ndarray  # (P, 3)
    tra_b: jnp.ndarray  # (P, 3)
    weight: jnp.ndarray  # (P,) 1.0 for pairs that pass the filters


def pair_indices(n: int):
    """Static all-pairs (i, j) with i < j (handeyedlt.cpp:63-75)."""
    ii, jj = [], []
    for i in range(n - 1):
        for j in range(i + 1, n):
            ii.append(i)
            jj.append(j)
    return jnp.array(ii), jnp.array(jj)


def build_all_pairs(
    base_se3_gripper,
    cam_se3_target,
    min_angle_deg: float = 1.0,
    reject_axis_parallel: bool = True,
    axis_parallel_eps: float = 1e-3,
    pose_mask=None,
):
    """Motion pairs with filter weights (handeyedlt.cpp:11-81).

    base_se3_gripper/cam_se3_target: (N, 4, 4); pose_mask: optional (N,).
    """
    n = base_se3_gripper.shape[0]
    ii, jj = pair_indices(n)
    a_i, a_j = base_se3_gripper[ii], base_se3_gripper[jj]
    b_i, b_j = cam_se3_target[ii], cam_se3_target[jj]

    affine_a = se3.se3_inverse(a_i) @ a_j
    affine_b = b_i @ se3.se3_inverse(b_j)
    rot_a = se3.project_to_so3(se3.rot(affine_a))
    rot_b = se3.project_to_so3(se3.rot(affine_b))
    tra_a = se3.tra(affine_a)
    tra_b = se3.tra(affine_b)

    alpha = se3.log_so3(rot_a)
    beta = se3.log_so3(rot_b)
    na = jnp.linalg.norm(alpha, axis=-1)
    nb = jnp.linalg.norm(beta, axis=-1)
    min_rot = jnp.minimum(na, nb)
    good = min_rot >= (min_angle_deg * jnp.pi / 180.0)
    if reject_axis_parallel:
        an = alpha / jnp.maximum(na, 1e-12)[..., None]
        bn = beta / jnp.maximum(nb, 1e-12)[..., None]
        sin_axis = jnp.linalg.norm(jnp.cross(an, bn), axis=-1)
        both_rotating = (na >= 1e-9) & (nb >= 1e-9)
        good = good & (~both_rotating | (sin_axis >= axis_parallel_eps))
    if pose_mask is not None:
        good = good & pose_mask[ii] & pose_mask[jj]
    return MotionPairs(rot_a, rot_b, tra_a, tra_b, good.astype(base_se3_gripper.dtype))


def _modified_rodrigues(rot):
    """2 sin(theta/2) * axis — the vector for which the Tsai-Lenz linear
    relation is exact (the reference feeds full axis-angle vectors into the
    same system, handeyedlt.cpp:84-99, which is only a small-angle
    approximation and costs degrees of error at ~1 rad motions)."""
    w = se3.log_so3(rot)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-16
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    s, _ = fmath.sincos(0.5 * theta)
    scale = jnp.where(small, 1.0 - theta2 / 24.0, 2.0 * s / theta)
    return w * scale[..., None]


def estimate_rotation_allpairs(pairs: MotionPairs):
    """Exact Tsai-Lenz rotation: skew(Pa + Pb) x = Pb - Pa with modified
    Rodrigues vectors; x = tan(theta_x/2) * axis_x."""
    pa = _modified_rodrigues(pairs.rot_a)
    pb = _modified_rodrigues(pairs.rot_b)
    m = se3.skew(pa + pb) * pairs.weight[:, None, None]
    d = (pb - pa) * pairs.weight[:, None]
    x = linalg.ridge_llsq(m.reshape(-1, 3), d.reshape(-1), 1e-12)
    t2 = jnp.sum(x * x)
    small = t2 < 1e-16
    t = jnp.sqrt(jnp.where(small, 1.0, t2))
    theta_x = 2.0 * fmath.atan(t)
    scale = jnp.where(small, 2.0 * (1.0 - t2 / 3.0), theta_x / t)
    return se3.exp_so3(x * scale)


def estimate_translation_allpairs(pairs: MotionPairs, rot_x):
    """(R_A - I) t = R_X t_B - t_A stacked ridge LSQ (handeyedlt.cpp:102-119)."""
    eye = jnp.eye(3, dtype=rot_x.dtype)
    c = (pairs.rot_a - eye) * pairs.weight[:, None, None]
    w = (jnp.einsum("ij,pj->pi", rot_x, pairs.tra_b) - pairs.tra_a) * pairs.weight[:, None]
    return linalg.ridge_llsq(c.reshape(-1, 3), w.reshape(-1), 1e-12)


def estimate_handeye_dlt(
    base_se3_gripper, cam_se3_target, min_angle_deg: float = 1.0, pose_mask=None
):
    """Tsai-Lenz linear init (handeyedlt.cpp:122-133). Returns (X (4,4), ok)."""
    pairs = build_all_pairs(
        base_se3_gripper, cam_se3_target, min_angle_deg, pose_mask=pose_mask
    )
    ok = jnp.sum(pairs.weight) > 0
    rot_x = estimate_rotation_allpairs(pairs)
    tra_x = estimate_translation_allpairs(pairs, rot_x)
    return se3.make_se3(rot_x, tra_x), ok
