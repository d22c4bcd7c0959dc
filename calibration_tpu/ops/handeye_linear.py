"""Tsai-Lenz hand-eye DLT (reference: src/estimation/linear/handeyedlt.cpp).

The reference's data-dependent pair filtering (min rotation angle,
near-parallel axes) becomes a weight vector over the static all-pairs set, so
the stacked 3P x 3 ridge solves keep fixed shapes under jit/vmap.

Quaternion-native pair construction (round 4): the relative motions, their
SO(3) projection, the angle/axis filters and the modified Rodrigues vectors
are all derived from pose quaternions — N ``rotmat_to_quat`` conversions per
rig instead of the previous 2P per-pair 3x3 SVD polar projections + P matrix
logs (P = N(N-1)/2; the batched tiny f64 SVD is this TPU attachment's
slowest primitive, and the hand-eye config was seed-bound on it, measured
round 4). Specifically:

- relative rotation A_ij = R_i^T R_j as q_rel = conj(q_i) (x) q_j; its
  renormalization + w>=0 sign fix IS the projection to SO(3) (replaces
  ``project_to_so3``'s SVD for these already-orthogonal products);
- rotation angle via |vec(q_rel)| = sin(theta/2) — the min-angle and
  axis-parallel filters become pure comparisons, no log/acos per pair;
- the modified Rodrigues vector 2 sin(theta/2) * axis used by the exact
  Tsai-Lenz relation is EXACTLY 2 vec(q_rel) — free.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from . import fmath, linalg, se3


class MotionPairs(NamedTuple):
    rot_a: jnp.ndarray  # (P, 3, 3)
    rot_b: jnp.ndarray  # (P, 3, 3)
    tra_a: jnp.ndarray  # (P, 3)
    tra_b: jnp.ndarray  # (P, 3)
    weight: jnp.ndarray  # (P,) 1.0 for pairs that pass the filters
    # unit pair quaternions with w >= 0 (rot_a == quat_to_rotmat(q_a));
    # carried so downstream consumers (Tsai-Lenz rotation, the algebraic
    # AX=XB residual) never re-derive them per LM iteration
    q_a: jnp.ndarray  # (P, 4)
    q_b: jnp.ndarray  # (P, 4)


def pair_indices(n: int):
    """Static all-pairs (i, j) with i < j (handeyedlt.cpp:63-75)."""
    ii, jj = [], []
    for i in range(n - 1):
        for j in range(i + 1, n):
            ii.append(i)
            jj.append(j)
    return jnp.array(ii), jnp.array(jj)


def _canonical(q):
    """Normalize + fix the double cover (w >= 0): the quaternion-route
    projection to SO(3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)


def pair_weights(
    q_a,
    q_b,
    min_angle_deg: float,
    reject_axis_parallel: bool = True,
    axis_parallel_eps: float = 1e-3,
):
    """Filter weights from pair quaternions (handeyedlt.cpp:63-75 semantics).

    theta >= theta_min  <=>  |vec(q)| >= sin(theta_min/2) for canonical q
    (theta in [0, pi]); axis-parallel via the cross of normalized vector
    parts. Trig only on the STATIC threshold (host math.sin)."""
    vec_a, vec_b = q_a[..., 1:4], q_b[..., 1:4]
    sin_half_a = jnp.linalg.norm(vec_a, axis=-1)
    sin_half_b = jnp.linalg.norm(vec_b, axis=-1)
    thresh = math.sin(0.5 * math.radians(min_angle_deg))
    good = jnp.minimum(sin_half_a, sin_half_b) >= thresh
    if reject_axis_parallel:
        an = vec_a / jnp.maximum(sin_half_a, 1e-12)[..., None]
        bn = vec_b / jnp.maximum(sin_half_b, 1e-12)[..., None]
        sin_axis = jnp.linalg.norm(jnp.cross(an, bn), axis=-1)
        # both_rotating: theta >= 1e-9 rad <=> sin(theta/2) >= 5e-10
        both_rotating = (sin_half_a >= 5e-10) & (sin_half_b >= 5e-10)
        good = good & (~both_rotating | (sin_axis >= axis_parallel_eps))
    return good


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
    rot_bg, tra_bg = se3.rot(base_se3_gripper), se3.tra(base_se3_gripper)
    rot_ct, tra_ct = se3.rot(cam_se3_target), se3.tra(cam_se3_target)
    q_bg = se3.rotmat_to_quat(rot_bg)  # (N, 4) — N conversions, not P
    q_ct = se3.rotmat_to_quat(rot_ct)

    # A_ij = inv(a_i) a_j (gripper motion); B_ij = b_i inv(b_j) (camera motion)
    q_a = _canonical(se3.quat_mul(se3.quat_conj(q_bg[ii]), q_bg[jj]))
    q_b = _canonical(se3.quat_mul(q_ct[ii], se3.quat_conj(q_ct[jj])))
    rot_a = se3.quat_to_rotmat(q_a)
    rot_b = se3.quat_to_rotmat(q_b)
    tra_a = jnp.einsum("pji,pj->pi", rot_bg[ii], tra_bg[jj] - tra_bg[ii])
    tra_b = tra_ct[ii] - jnp.einsum("pij,pj->pi", rot_b, tra_ct[jj])

    good = pair_weights(q_a, q_b, min_angle_deg, reject_axis_parallel, axis_parallel_eps)
    if pose_mask is not None:
        good = good & pose_mask[ii] & pose_mask[jj]
    return MotionPairs(
        rot_a, rot_b, tra_a, tra_b, good.astype(base_se3_gripper.dtype), q_a, q_b
    )


def reweight(pairs: MotionPairs, min_angle_deg: float, **kw) -> MotionPairs:
    """Same pairs under a different angle threshold (the DLT seeds at the
    caller's min_angle while the LM refine uses 0.5 deg, handeye.cpp:64-65)
    — weights recomputed from the stored quaternions, nothing rebuilt."""
    good = pair_weights(pairs.q_a, pairs.q_b, min_angle_deg, **kw)
    return pairs._replace(weight=good.astype(pairs.weight.dtype))


def _modified_rodrigues(rot):
    """2 sin(theta/2) * axis from a rotation MATRIX — the vector for which
    the Tsai-Lenz linear relation is exact (the reference feeds full
    axis-angle vectors into the same system, handeyedlt.cpp:84-99, which is
    only a small-angle approximation and costs degrees of error at ~1 rad
    motions). Kept as the matrix-input reference implementation; the pair
    path reads 2 vec(q) directly (identical by definition, tested)."""
    w = se3.log_so3(rot)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-16
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    s, _ = fmath.sincos(0.5 * theta)
    scale = jnp.where(small, 1.0 - theta2 / 24.0, 2.0 * s / theta)
    return w * scale[..., None]


def estimate_rotation_allpairs(pairs: MotionPairs):
    """Exact Tsai-Lenz rotation: skew(Pa + Pb) x = Pb - Pa with modified
    Rodrigues vectors; x = tan(theta_x/2) * axis_x. Pa = 2 vec(q_a) exactly
    (canonical quaternions: vec = sin(theta/2) axis)."""
    pa = 2.0 * pairs.q_a[..., 1:4]
    pb = 2.0 * pairs.q_b[..., 1:4]
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


def estimate_handeye_dlt_pairs(pairs: MotionPairs):
    """Tsai-Lenz linear init from prebuilt pairs. Returns (X (4,4), ok)."""
    ok = jnp.sum(pairs.weight) > 0
    rot_x = estimate_rotation_allpairs(pairs)
    tra_x = estimate_translation_allpairs(pairs, rot_x)
    return se3.make_se3(rot_x, tra_x), ok


def estimate_handeye_dlt(
    base_se3_gripper, cam_se3_target, min_angle_deg: float = 1.0, pose_mask=None
):
    """Tsai-Lenz linear init (handeyedlt.cpp:122-133). Returns (X (4,4), ok)."""
    pairs = build_all_pairs(
        base_se3_gripper, cam_se3_target, min_angle_deg, pose_mask=pose_mask
    )
    return estimate_handeye_dlt_pairs(pairs)
