"""Planar pose refinement with variable-projection distortion elimination
(reference: src/estimation/optim/planarpose.cpp).

The pose is a 6-vector (angle-axis + translation, the reference's pose6
packing); each LM residual evaluation transforms the target points, then
solves the linear distortion system and returns *its* residuals — distortion
never enters the LM state (VarPro). The inner solve is the differentiable
masked normal-equation fit in models.distortion.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models import distortion as dist
from ..ops import se3
from . import lm
from .core import OptimOptions, OptimResult, TerminationType, brief_report
from .manifold import ProductManifold, euclid

_MANIFOLD = ProductManifold([euclid(6)])


def _normalized_obs(pose6, obj_xy):
    """Target points -> normalized camera coords under the pose
    (to_observation, src/estimation/detail/observationutils.h:98-113)."""
    pose = se3.se3_exp(pose6)
    pts = jnp.concatenate([obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], axis=-1)
    pc = se3.se3_apply(pose[None], pts)
    return pc[..., :2] / pc[..., 2:3]


def _vp_residual(pose6, obj_xy, img_uv, kmtx, num_radial, mask):
    xy = _normalized_obs(pose6, obj_xy)
    _, res, _ = dist.fit_distortion_full(xy, img_uv, kmtx, num_radial, mask=mask)
    return res


def optimize_planar_pose_device(
    init_pose, obj_xy, img_uv, kmtx, num_radial=2, mask=None, options=OptimOptions()
):
    """Pure-jnp core. Returns (LMOutput, pose 4x4, distortion coeffs, cov, cov_ok,
    reprojection_rms)."""
    n = obj_xy.shape[-2]
    if mask is None:
        mask = jnp.ones((n,), bool)
    pose6_0 = se3.se3_log(jnp.asarray(init_pose))

    res_fn = lambda p: _vp_residual(p, obj_xy, img_uv, kmtx, num_radial, mask)
    # single residual block (one DynamicAutoDiffCostFunction in the reference)
    out = lm.lm_core(res_fn, pose6_0, _MANIFOLD, options=options, num_blocks=1)

    xy = _normalized_obs(out.x, obj_xy)
    coeffs, res, _ = dist.fit_distortion_full(xy, img_uv, kmtx, num_radial, mask=mask)
    # m counts VALID residual rows only (masked rows are zeroed by the inner
    # fit, so the ssr is already mask-correct; dividing by 2n would silently
    # under-report RMS on padded views — ceresutils.h:117-123 semantics).
    m = 2.0 * jnp.maximum(jnp.sum(jnp.asarray(mask, res.dtype)), 1.0)
    rms = jnp.sqrt(jnp.sum(res * res) / m)
    if options.compute_covariance:
        cov, cov_ok = lm.covariance(
            res_fn, out.x, _MANIFOLD, scale_by_variance=True, num_residuals=m,
            num_blocks=1, huber_delta=options.huber_delta,
        )
    else:
        # skip the extra linearization + 6x6 solve when covariance is off
        cov = jnp.zeros((6, 6), out.x.dtype)
        cov_ok = jnp.asarray(False)
    return out, se3.se3_exp(out.x), coeffs, cov, cov_ok, rms


@dataclasses.dataclass
class PlanarPoseResult:
    core: OptimResult
    pose: np.ndarray
    distortion: np.ndarray
    reprojection_error: float


@dataclasses.dataclass(frozen=True)
class PlanarPoseOptions:
    core: OptimOptions = dataclasses.field(default_factory=OptimOptions)
    num_radial: int = 2


def optimize_planar_pose(obj_xy, img_uv, kmtx, init_pose, opts: PlanarPoseOptions = None, mask=None):
    opts = opts or PlanarPoseOptions()
    out, pose, coeffs, cov, cov_ok, rms = optimize_planar_pose_device(
        jnp.asarray(init_pose),
        jnp.asarray(obj_xy),
        jnp.asarray(img_uv),
        jnp.asarray(kmtx),
        num_radial=opts.num_radial,
        mask=mask,
        options=opts.core,
    )
    core = OptimResult(
        success=bool(out.success),
        covariance=np.asarray(cov) if (opts.core.compute_covariance and bool(cov_ok)) else None,
        final_cost=float(out.cost),
        iterations=int(out.iterations),
        termination=TerminationType(int(out.termination)),
        initial_cost=float(out.initial_cost),
    )
    core.report = brief_report(core)
    return PlanarPoseResult(
        core=core,
        pose=np.asarray(pose),
        distortion=np.asarray(coeffs),
        reprojection_error=float(rms),
    )
