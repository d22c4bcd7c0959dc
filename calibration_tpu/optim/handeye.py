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


def optimize_handeye_device(pairs: hel.MotionPairs, init_pose, options=OptimOptions()):
    """Pure-jnp core. Returns (LMOutput, X (4,4), cov, cov_ok)."""
    q0 = se3.rotmat_to_quat(se3.rot(init_pose))
    t0 = se3.tra(init_pose)
    x0 = jnp.concatenate([q0, t0])
    p = pairs.rot_a.shape[0]
    block_ids = jnp.repeat(jnp.arange(p, dtype=jnp.int32), 6)
    res_fn = lambda x: _residual(x, pairs)
    out = lm.lm_core(
        res_fn, x0, _MANIFOLD, options=options, block_ids=block_ids, num_blocks=p
    )
    cov, cov_ok = lm.covariance(
        res_fn, out.x, _MANIFOLD,
        block_ids=block_ids, num_blocks=p, huber_delta=options.huber_delta,
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
    base_se3_gripper, camera_se3_target, init_pose, options: OptimOptions = OptimOptions()
):
    """optimize_handeye (handeye.cpp:60-78): rebuild pairs at min angle 0.5 deg,
    refine from init_pose."""
    pairs = hel.build_all_pairs(
        jnp.asarray(base_se3_gripper), jnp.asarray(camera_se3_target), OPTIMIZE_MIN_ANGLE_DEG
    )
    out, pose, cov, cov_ok = optimize_handeye_device(pairs, jnp.asarray(init_pose), options)
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
