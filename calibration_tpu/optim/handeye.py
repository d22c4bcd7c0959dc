"""AX = XB hand-eye refinement (reference: src/estimation/optim/handeye.cpp
+ residuals/handeyeresidual.h; derivation doc/ax_xb_residual.md).

Parameters: one quaternion + translation for X = gripper->camera. Each
motion pair contributes a 6-vector residual:
rot: log(R_A R_X R_B^T R_X^T); tra: (R_A - I) t_X - (R_X t_B - t_A).
Filtered pairs enter with weight 0 (fixed shapes under jit/vmap).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import handeye_linear as hel
from ..ops import se3
from . import lm
from .core import OptimOptions, OptimResult, TerminationType, brief_report
from .manifold import ProductManifold, euclid, quat

_MANIFOLD = ProductManifold([quat(), euclid(3)])
OPTIMIZE_MIN_ANGLE_DEG = 0.5  # handeye.cpp:64


def _residual(x, pairs: hel.MotionPairs):
    q, t = x[:4], x[4:7]
    rot_x = se3.quat_to_rotmat(q)
    rot_s = pairs.rot_a @ rot_x[None] @ jnp.swapaxes(pairs.rot_b, -1, -2) @ rot_x.T[None]
    r_rot = se3.log_so3(rot_s)  # (P, 3)
    r_tra = (
        jnp.einsum("pij,j->pi", pairs.rot_a - jnp.eye(3, dtype=x.dtype), t)
        - (jnp.einsum("ij,pj->pi", rot_x, pairs.tra_b) - pairs.tra_a)
    )
    r = jnp.concatenate([r_rot, r_tra], axis=-1) * pairs.weight[:, None]
    return r.reshape(-1)


def _jl_inv(phi):
    """Inverse left Jacobian of SO(3) at rotation vector phi: (..., 3) ->
    (..., 3, 3). J_l^-1 = I - [phi]_x/2 + c [phi]_x^2 with
    c = 1/theta^2 - (1 + cos)/(2 theta sin); series 1/12 + theta^2/720
    below the switch point (exact to f64 roundoff there). Trig via
    ops/fmath — small-array backend sin/cos is only f32-accurate on this
    toolchain (CLAUDE.md), and P can be 1 for a two-pose sequence."""
    from ..ops import fmath

    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-300))
    small = theta < 1e-4
    theta_safe = jnp.where(small, 1.0, theta)
    s, co = fmath.sincos(theta_safe)
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / jnp.where(small, 1.0, theta2) - (1.0 + co) / (2.0 * theta_safe * s),
    )
    sk = se3.skew(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * sk + c[..., None, None] * (sk @ sk)


def _residual_jac(x, pairs: hel.MotionPairs):
    """Analytic tangent Jacobian of ``_residual``: (6P, 6), columns
    [omega(3), dt(3)] with the right-multiplied quaternion retraction
    R_X -> R_X exp(omega^).

    rot rows: M(w) = R_A R_X exp(w^) R_B^T exp(-w^) R_X^T perturbs M by
    exp(delta^) M with delta = R_A R_X (I - R_B^T) w, so
    d log(M)/dw = J_l^-1(log M) R_A R_X (I - R_B^T)  (dt columns zero).
    tra rows: d/dt = R_A - I; d/dw = R_X [t_B]_x.
    Equals jacfwd of the retracted residual (tested); reference analogue:
    the Jets through AxXbResidual (residuals/handeyeresidual.h:18-54)."""
    q, t = x[:4], x[4:7]
    rot_x = se3.quat_to_rotmat(q)
    rot_bt = jnp.swapaxes(pairs.rot_b, -1, -2)
    rot_s = pairs.rot_a @ rot_x[None] @ rot_bt @ rot_x.T[None]
    r0 = se3.log_so3(rot_s)  # (P, 3)
    ra_rx = pairs.rot_a @ rot_x[None]  # (P, 3, 3)
    eye = jnp.eye(3, dtype=x.dtype)
    j_rot_w = _jl_inv(r0) @ ra_rx @ (eye - rot_bt)  # (P, 3, 3)
    zeros = jnp.zeros_like(j_rot_w)
    j_tra_w = jnp.einsum("ij,pjk->pik", rot_x, se3.skew(pairs.tra_b))
    j_tra_t = pairs.rot_a - eye
    top = jnp.concatenate([j_rot_w, zeros], axis=-1)  # (P, 3, 6)
    bot = jnp.concatenate([j_tra_w, j_tra_t], axis=-1)  # (P, 3, 6)
    jac = jnp.concatenate([top, bot], axis=-2) * pairs.weight[:, None, None]
    return jac.reshape(-1, 6)


def optimize_handeye_device(
    pairs: hel.MotionPairs, init_pose, options=OptimOptions(), analytic_jac: bool = True
):
    """Pure-jnp core. Returns (LMOutput, X (4,4), cov, cov_ok).

    analytic_jac: hand-derived (6P, 6) Jacobian (identical to jacfwd,
    avoids pushing 6 tangents through log_so3 — also shrinks the jacfwd
    while-loop temps that cap the batched path's HBM)."""
    q0 = se3.rotmat_to_quat(se3.rot(init_pose))
    t0 = se3.tra(init_pose)
    x0 = jnp.concatenate([q0, t0])
    p = pairs.rot_a.shape[0]
    block_ids = jnp.repeat(jnp.arange(p, dtype=jnp.int32), 6)
    res_fn = lambda x: _residual(x, pairs)
    jac_fn = (lambda x: _residual_jac(x, pairs)) if analytic_jac else None
    out = lm.lm_core(
        res_fn, x0, _MANIFOLD, options=options, block_ids=block_ids, num_blocks=p,
        jac_fn=jac_fn,
    )
    cov, cov_ok = lm.covariance(
        res_fn, out.x, _MANIFOLD,
        block_ids=block_ids, num_blocks=p, huber_delta=options.huber_delta,
        jac_fn=jac_fn,
    )
    pose = se3.make_se3(se3.quat_to_rotmat(out.x[:4]), out.x[4:7])
    return out, pose, cov, cov_ok


@dataclasses.dataclass
class HandeyeResult:
    core: OptimResult
    g_se3_c: np.ndarray  # (4, 4)


def _wrap_result(out, pose, cov, cov_ok, options) -> HandeyeResult:
    core = OptimResult(
        success=bool(out.success),
        covariance=np.asarray(cov) if (options.compute_covariance and bool(cov_ok)) else None,
        final_cost=float(out.cost),
        iterations=int(out.iterations),
        termination=TerminationType(int(out.termination)),
        initial_cost=float(out.initial_cost),
    )
    core.report = brief_report(core)
    return HandeyeResult(core=core, g_se3_c=np.asarray(pose))


def optimize_handeye(
    base_se3_gripper, camera_se3_target, init_pose,
    options: OptimOptions = OptimOptions(), analytic_jac: bool = True,
):
    """optimize_handeye (handeye.cpp:60-78): rebuild pairs at min angle 0.5 deg,
    refine from init_pose."""
    pairs = hel.build_all_pairs(
        jnp.asarray(base_se3_gripper), jnp.asarray(camera_se3_target), OPTIMIZE_MIN_ANGLE_DEG
    )
    out, pose, cov, cov_ok = optimize_handeye_device(
        pairs, jnp.asarray(init_pose), options, analytic_jac=analytic_jac
    )
    return _wrap_result(out, pose, cov, cov_ok, options)


def estimate_and_optimize_handeye(
    base_se3_gripper,
    camera_se3_target,
    min_angle_deg: float = 1.0,
    options: OptimOptions = OptimOptions(),
):
    """DLT seed -> LM refine (handeye.cpp:80-87)."""
    init_pose, _ = hel.estimate_handeye_dlt(
        jnp.asarray(base_se3_gripper), jnp.asarray(camera_se3_target), min_angle_deg
    )
    return optimize_handeye(base_se3_gripper, camera_se3_target, init_pose, options)
