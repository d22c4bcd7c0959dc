"""Semi-DLT intrinsics: K + per-view poses refined with distortion eliminated
globally by variable projection (reference:
src/estimation/optim/intrinsicssemidlt.cpp + residuals/intrinsicsemidltresidual.h).

Parameters: [K(5), quat_0..quat_V, t_0..t_V]; the residual is the inner
linear distortion fit's residual over ALL views at once (one
DynamicAutoDiffCostFunction in the reference, so a single Huber block).
Distortion coefficients are recovered after the solve by re-running the
inner fit (solve_full, intrinsicssemidlt.cpp:101-117).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models import distortion as dist
from ..ops import planarpose, se3
from . import blocks, lm
from .core import OptimResult, TerminationType, brief_report
from .intrinsics import IntrinsicsOptimOptions, make_manifold


def _fixed_arrays(opts: IntrinsicsOptimOptions, d: int):
    fixed_mask = np.zeros((d,), bool)
    fixed_vals = np.zeros((d,), np.float64)
    for i, idx in enumerate(opts.fixed_distortion_indices):
        if idx < 0 or idx >= d:
            raise ValueError("Fixed distortion index out of range")
        fixed_mask[idx] = True
        if i < len(opts.fixed_distortion_values):
            fixed_vals[idx] = opts.fixed_distortion_values[i]
    return jnp.asarray(fixed_mask), jnp.asarray(fixed_vals)


def _normalized_obs(quats, trans, obj_xy):
    """Per-view target points -> normalized camera coords
    (planar_observables_to_observables, observationutils.h:88-96)."""
    rot = se3.quat_to_rotmat(quats)
    pts = jnp.concatenate([obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], -1)
    pc3 = jnp.einsum("vij,vnj->vni", rot, pts) + trans[:, None, :]
    return pc3[..., :2] / pc3[..., 2:3]


def _vp_residual(x, obj_xy, img_uv, mask, num_radial, fixed_mask, fixed_vals, v):
    kmtx, quats, trans = blocks.unpack_intr_quats_trans(x, 5, v)
    xy = _normalized_obs(quats, trans, obj_xy).reshape(-1, 2)
    uv = img_uv.reshape(-1, 2)
    m = mask.reshape(-1)
    _, res, _ = dist.fit_distortion_full(
        xy, uv, kmtx, num_radial, mask=m, fixed_mask=fixed_mask, fixed_values=fixed_vals
    )
    return res


def optimize_intrinsics_semidlt_device(
    obj_xy, img_uv, init_kmtx, mask=None, opts: IntrinsicsOptimOptions | None = None
):
    """Pure-jnp core. obj_xy/img_uv: (V, N, 2); init_kmtx: (5,); mask: (V, N).

    Pose init comes from per-view planar-pose DLT under the initial K
    (IntrinsicBlocks::create, intrinsicssemidlt.cpp:36-49).
    """
    opts = opts or IntrinsicsOptimOptions()
    v, n = obj_xy.shape[0], obj_xy.shape[1]
    d = opts.num_radial + 2
    if mask is None:
        mask = jnp.ones((v, n), bool)
    fixed_mask, fixed_vals = _fixed_arrays(opts, d)

    init_kmtx = jnp.asarray(init_kmtx)
    poses0 = planarpose.estimate_planar_pose(
        obj_xy, img_uv, jnp.broadcast_to(init_kmtx, (v, 5)), mask
    )
    quats0, trans0 = blocks.poses_to_quat_tran(poses0)
    x0 = blocks.pack_intr_quats_trans(init_kmtx, quats0, trans0)
    manifold = make_manifold(5, v)

    free = np.ones((5 + 7 * v,), bool)
    if not opts.optimize_skew:
        free[4] = False
    free = jnp.asarray(free)

    lower = upper = None
    if opts.bounds is not None:
        b = opts.bounds
        lower = jnp.concatenate(
            [jnp.array([b.fx_min, b.fy_min, b.cx_min, b.cy_min, b.skew_min]),
             jnp.full((7 * v,), -jnp.inf)]
        )
        upper = jnp.concatenate(
            [jnp.array([b.fx_max, b.fy_max, b.cx_max, b.cy_max, b.skew_max]),
             jnp.full((7 * v,), jnp.inf)]
        )

    res_fn = lambda x: _vp_residual(
        x, obj_xy, img_uv, mask, opts.num_radial, fixed_mask, fixed_vals, v
    )
    out = lm.lm_core(
        res_fn, x0, manifold, options=opts.core, free_mask=free,
        num_blocks=1, lower=lower, upper=upper,
    )
    if opts.core.compute_covariance:
        cov, cov_ok = lm.covariance(
            res_fn, out.x, manifold, free_mask=free,
            num_blocks=1, huber_delta=opts.core.huber_delta,
        )
    else:
        # skip the extra linearization + ambient solve when covariance is off
        n_amb = manifold.ambient_dim
        cov = jnp.zeros((n_amb, n_amb), x0.dtype)
        cov_ok = jnp.asarray(False)

    kmtx, quats_f, trans_f = blocks.unpack_intr_quats_trans(out.x, 5, v)
    xy = _normalized_obs(quats_f, trans_f, obj_xy).reshape(-1, 2)
    coeffs, res, _ = dist.fit_distortion_full(
        xy, img_uv.reshape(-1, 2), kmtx, opts.num_radial,
        mask=jnp.asarray(mask).reshape(-1), fixed_mask=fixed_mask, fixed_values=fixed_vals,
    )
    res_v = res.reshape(v, 2 * n)
    cnt = jnp.maximum(jnp.sum(jnp.asarray(mask, res.dtype), axis=-1), 1.0)
    view_errors = jnp.sqrt(jnp.sum(res_v * res_v, axis=-1) / (2.0 * cnt))
    poses = blocks.quat_tran_to_poses(quats_f, trans_f)
    return out, kmtx, coeffs, poses, view_errors, cov, cov_ok, jnp.sum(res * res)


@dataclasses.dataclass
class SemiDltResult:
    core: OptimResult
    kmtx: np.ndarray  # (5,)
    distortion: np.ndarray  # (num_radial + 2,)
    c_se3_t: np.ndarray  # (V, 4, 4)
    view_errors: np.ndarray


def optimize_intrinsics_semidlt(
    obj_xy, img_uv, initial_guess, mask=None, opts: IntrinsicsOptimOptions | None = None
):
    opts = opts or IntrinsicsOptimOptions()
    obj_xy = jnp.asarray(obj_xy)
    if obj_xy.shape[0] < 4:
        raise ValueError("Insufficient views for calibration (at least 4 required).")
    out, kmtx, coeffs, poses, view_errors, cov, cov_ok, ssr = (
        optimize_intrinsics_semidlt_device(
            obj_xy, jnp.asarray(img_uv), jnp.asarray(initial_guess), mask=mask, opts=opts
        )
    )
    # the reference scales this covariance by ssr/(m - n)
    # (intrinsicssemidlt.cpp:166-170); m counts VALID residual rows — padded
    # rows are zeroed placeholders, not observations (ceresutils.h:117-123).
    if mask is not None:
        m = 2 * int(np.asarray(mask, bool).sum())
    else:
        m = int(np.prod(np.asarray(obj_xy).shape[:2])) * 2
    ambient = 5 + 7 * obj_xy.shape[0]
    cov_scaled = np.asarray(cov) * (float(ssr) / max(1, m - ambient))
    core = OptimResult(
        success=bool(out.success),
        covariance=cov_scaled if (opts.core.compute_covariance and bool(cov_ok)) else None,
        final_cost=float(out.cost),
        iterations=int(out.iterations),
        termination=TerminationType(int(out.termination)),
        initial_cost=float(out.initial_cost),
    )
    core.report = brief_report(core)
    return SemiDltResult(
        core=core, kmtx=np.asarray(kmtx), distortion=np.asarray(coeffs),
        c_se3_t=np.asarray(poses), view_errors=np.asarray(view_errors),
    )
