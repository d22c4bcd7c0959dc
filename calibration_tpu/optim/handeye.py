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


def _residual_quat(x, pairs: hel.MotionPairs, q_a, q_b):
    """Algebraic rotation residual: r_rot = 2 sgn(w) vec(q_err) with
    q_err = q_A (x) q_X (x) conj(q_B) (x) conj(q_X) — the quaternion of the
    same error rotation R_A R_X R_B^T R_X^T the log residual measures.

    |r_rot| = 2 sin(theta/2) = theta (1 - theta^2/24 + ...), so the zero set
    and the first-order behavior at the minimum are IDENTICAL to the
    reference's log residual (handeyeresidual.h:33-47); the objectives
    differ only at O(theta^3) per residual (same-minimum gate:
    tests/test_lm_solvers.py::test_handeye_quat_residual_same_minimum,
    bench_all config-4 cost parity). The win: the whole residual is pure
    quaternion polynomial algebra — NO log_so3/acos/atan2 per pair per LM
    iteration (the round-3 verdict's hand-eye bottleneck: transcendental
    f64 VPU work), and jacfwd differentiates a polynomial chain.

    q_a, q_b: (P, 4) quaternions of pairs.rot_a / pairs.rot_b, precomputed
    once outside the LM loop. Translation rows unchanged.
    """
    q, t = x[:4], x[4:7]
    rot_x = se3.quat_to_rotmat(q)
    q_err = se3.quat_mul(
        se3.quat_mul(se3.quat_mul(q_a, q[None]), se3.quat_conj(q_b)),
        se3.quat_conj(q)[None],
    )  # (P, 4)
    sgn = jnp.where(q_err[..., :1] < 0.0, -1.0, 1.0)
    r_rot = 2.0 * sgn * q_err[..., 1:4]
    r_tra = (
        jnp.einsum("pij,j->pi", pairs.rot_a - jnp.eye(3, dtype=x.dtype), t)
        - (jnp.einsum("ij,pj->pi", rot_x, pairs.tra_b) - pairs.tra_a)
    )
    r = jnp.concatenate([r_rot, r_tra], axis=-1) * pairs.weight[:, None]
    return r.reshape(-1)


def _qmat_l(q):
    """Left-multiplication matrix: quat_mul(q, p) == _qmat_l(q) @ p."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([w, -x, -y, -z], -1),
            jnp.stack([x, w, -z, y], -1),
            jnp.stack([y, z, w, -x], -1),
            jnp.stack([z, -y, x, w], -1),
        ],
        axis=-2,
    )


def _qmat_r(q):
    """Right-multiplication matrix: quat_mul(p, q) == _qmat_r(q) @ p."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([w, -x, -y, -z], -1),
            jnp.stack([x, w, z, -y], -1),
            jnp.stack([y, -z, w, x], -1),
            jnp.stack([z, y, -x, w], -1),
        ],
        axis=-2,
    )


def _residual_quat_jac(x, pairs: hel.MotionPairs, q_a, q_b):
    """Analytic tangent Jacobian of ``_residual_quat``: (6P, 6), columns
    [omega(3), dt(3)], right-multiplied quaternion retraction
    q_X -> q_X (x) exp_quat(omega) (d exp_quat/d omega |_0 = E/2 with
    E = [0; I3]).

    With u = q_A (x) q_X:  q_err(omega) = u (x) e (x) conj(q_B) (x)
    conj(e) (x) conj(q_X), so
      d q_err = [L(u) R(conj(q_B) conj(q_X)) - L(u conj(q_B)) R(conj(q_X))]
                (E/2) d omega
    and r_rot = 2 sgn vec(q_err) gives J_rot = sgn * M[1:4, 1:4] with M the
    bracketed matrix — pure polynomial algebra, no transcendentals.
    Translation rows as in ``_residual_jac``. Equals jacfwd of the retracted
    residual (tested)."""
    q, t = x[:4], x[4:7]
    rot_x = se3.quat_to_rotmat(q)
    q_x_c = se3.quat_conj(q)
    qb_c = se3.quat_conj(q_b)
    u = se3.quat_mul(q_a, q[None])  # (P, 4)
    u_qbc = se3.quat_mul(u, qb_c)  # (P, 4)
    q_err = se3.quat_mul(u_qbc, q_x_c[None])
    sgn = jnp.where(q_err[..., 0] < 0.0, -1.0, 1.0)  # (P,)
    v1 = se3.quat_mul(qb_c, q_x_c[None])  # (P, 4)
    m = _qmat_l(u) @ _qmat_r(v1) - _qmat_l(u_qbc) @ _qmat_r(q_x_c)
    j_rot_w = sgn[:, None, None] * m[:, 1:4, 1:4]  # (P, 3, 3)
    eye = jnp.eye(3, dtype=x.dtype)
    zeros = jnp.zeros_like(j_rot_w)
    j_tra_w = jnp.einsum("ij,pjk->pik", rot_x, se3.skew(pairs.tra_b))
    j_tra_t = pairs.rot_a - eye
    top = jnp.concatenate([j_rot_w, zeros], axis=-1)  # (P, 3, 6)
    bot = jnp.concatenate([j_tra_w, j_tra_t], axis=-1)  # (P, 3, 6)
    jac = jnp.concatenate([top, bot], axis=-2) * pairs.weight[:, None, None]
    return jac.reshape(-1, 6)


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
    pairs: hel.MotionPairs,
    init_pose,
    options=OptimOptions(),
    analytic_jac: bool = True,
    rot_residual: str = "quat",
):
    """Pure-jnp core. Returns (LMOutput, X (4,4), cov, cov_ok).

    rot_residual: "quat" (default) uses the algebraic quaternion-difference
    rotation residual — transcendental-free inner loop, same minimum to
    O(theta^3) (see ``_residual_quat``); "log" is the reference's exact
    log-map residual (handeyeresidual.h:33-47), kept for A/B and parity
    gates.

    analytic_jac: hand-derived (6P, 6) Jacobian (identical to jacfwd;
    for "log" it avoids pushing 6 tangents through log_so3 — also shrinks
    the jacfwd while-loop temps that cap the batched path's HBM)."""
    q0 = se3.rotmat_to_quat(se3.rot(init_pose))
    t0 = se3.tra(init_pose)
    x0 = jnp.concatenate([q0, t0])
    p = pairs.rot_a.shape[0]
    block_ids = jnp.repeat(jnp.arange(p, dtype=jnp.int32), 6)
    if rot_residual == "quat":
        # pair quaternions come prebuilt from the quaternion-native pair
        # construction — the LM loop never touches a transcendental
        q_a, q_b = pairs.q_a, pairs.q_b
        res_fn = lambda x: _residual_quat(x, pairs, q_a, q_b)
        jac_fn = (
            (lambda x: _residual_quat_jac(x, pairs, q_a, q_b)) if analytic_jac else None
        )
    elif rot_residual == "log":
        res_fn = lambda x: _residual(x, pairs)
        jac_fn = (lambda x: _residual_jac(x, pairs)) if analytic_jac else None
    else:
        raise ValueError(f"unknown rot_residual '{rot_residual}' (quat|log)")
    out = lm.lm_core(
        res_fn, x0, _MANIFOLD, options=options, block_ids=block_ids, num_blocks=p,
        jac_fn=jac_fn,
    )
    if options.compute_covariance:
        cov, cov_ok = lm.covariance(
            res_fn, out.x, _MANIFOLD,
            block_ids=block_ids, num_blocks=p, huber_delta=options.huber_delta,
            jac_fn=jac_fn,
        )
    else:
        # callers that disable covariance shouldn't pay the extra
        # linearization + 7x7 solve (same gating as extrinsics/bundle)
        cov = jnp.zeros((7, 7), x0.dtype)
        cov_ok = jnp.asarray(False)
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
    rot_residual: str = "quat",
):
    """optimize_handeye (handeye.cpp:60-78): rebuild pairs at min angle 0.5 deg,
    refine from init_pose."""
    pairs = hel.build_all_pairs(
        jnp.asarray(base_se3_gripper), jnp.asarray(camera_se3_target), OPTIMIZE_MIN_ANGLE_DEG
    )
    out, pose, cov, cov_ok = optimize_handeye_device(
        pairs, jnp.asarray(init_pose), options, analytic_jac=analytic_jac,
        rot_residual=rot_residual,
    )
    return _wrap_result(out, pose, cov, cov_ok, options)


def estimate_and_optimize_handeye(
    base_se3_gripper,
    camera_se3_target,
    min_angle_deg: float = 1.0,
    options: OptimOptions = OptimOptions(),
):
    """DLT seed -> LM refine (handeye.cpp:80-87). Pairs are built once; the
    LM refine reuses them reweighted at 0.5 deg (handeye.cpp:64-65)."""
    pairs = hel.build_all_pairs(
        jnp.asarray(base_se3_gripper), jnp.asarray(camera_se3_target), min_angle_deg
    )
    init_pose, _ = hel.estimate_handeye_dlt_pairs(pairs)
    out, pose, cov, cov_ok = optimize_handeye_device(
        hel.reweight(pairs, OPTIMIZE_MIN_ANGLE_DEG), init_pose, options
    )
    return _wrap_result(out, pose, cov, cov_ok, options)
