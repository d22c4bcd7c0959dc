"""Hand-eye bundle adjustment (reference: src/estimation/optim/bundle.cpp +
residuals/bundleresidual.h).

Parameter layout follows BundleBlocks::get_param_blocks
(bundle.cpp:62-81): [intr_0..intr_C, g_quat_0.., g_tra_0.., b_quat, b_tra].
The projection chain per observation is
c_se3_t = (g_se3_c)^-1 (b_se3_g)^-1 b_se3_t (bundleresidual.h:16-29).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models.registry import PINHOLE, CameraModelSpec
from ..ops import se3
from . import blocks, lm
from .core import OptimOptions, OptimResult, TerminationType, brief_report
from .manifold import ProductManifold, euclid, quat


@dataclasses.dataclass(frozen=True)
class BundleOptions:
    """Mirrors include/calib/estimation/optim/bundle.h:33-40."""

    core: OptimOptions = dataclasses.field(default_factory=OptimOptions)
    optimize_intrinsics: bool = False
    optimize_skew: bool = False
    optimize_target_pose: bool = True
    optimize_hand_eye: bool = True


def make_manifold(pc: int, c: int) -> ProductManifold:
    return ProductManifold(
        [euclid(pc)] * c + [quat()] * c + [euclid(3)] * c + [quat(), euclid(3)]
    )


def unpack(x, pc, c):
    o = 0
    intr = x[o : o + c * pc].reshape(c, pc); o += c * pc
    gq = x[o : o + 4 * c].reshape(c, 4); o += 4 * c
    gt = x[o : o + 3 * c].reshape(c, 3); o += 3 * c
    bq = x[o : o + 4]; o += 4
    bt = x[o : o + 3]
    return intr, gq, gt, bq, bt


def _residual(model, x, obj_xy, img_uv, mask, b_se3_g, cam_idx, pc, c):
    intr, gq, gt, bq, bt = unpack(x, pc, c)
    g_se3_c = blocks.quat_tran_to_poses(gq, gt)  # (C, 4, 4)
    b_se3_t = se3.make_se3(se3.quat_to_rotmat(bq), bt)  # (4, 4)
    c_se3_b = se3.se3_inverse(g_se3_c[cam_idx]) @ se3.se3_inverse(b_se3_g)  # (O,4,4)
    c_se3_t = c_se3_b @ b_se3_t[None]
    pts = jnp.concatenate([obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], -1)
    pc3 = jnp.einsum("oij,onj->oni", se3.rot(c_se3_t), pts) + se3.tra(c_se3_t)[:, None, :]
    uv_hat = model.project(intr[cam_idx][:, None, :], pc3)
    r = (uv_hat - img_uv) * mask[..., None]
    return r.reshape(-1)


def _residual_jac_pinhole(x, obj_xy, img_uv, mask, b_se3_g, cam_idx, pc, c):
    """Analytic tangent Jacobian of ``_residual`` for the PINHOLE model.

    Returns (O*N*2, C*pc + 6C + 6): columns in the make_manifold tangent
    layout [intr_0..intr_C, omega_g x C, t_g x C, omega_b(3), t_b(3)],
    hand-derived chain rule of
    project(intr_c, R_g^T (R_bo^T (R_b exp(omega_b^) p + t_b - t_bo)
    - t_g)) with right-multiplied quaternion retractions on g_se3_c and
    b_se3_t (the ProductManifold convention; equals jacfwd — tested in
    tests/test_lm_solvers.py). Assumes fx/fy box bounds are inactive.
    Reference analogue: the Jets flowing through BundleReprojResidual
    (residuals/bundleresidual.h:14-69).
    """
    import jax

    from ..models import pinhole

    intr, gq, gt, bq, bt = unpack(x, pc, c)
    rg = se3.quat_to_rotmat(gq)  # (C, 3, 3) gripper<-camera
    rb = se3.quat_to_rotmat(bq)  # base<-target
    rbo = se3.rot(b_se3_g)  # (O, 3, 3) base<-gripper
    tbo = se3.tra(b_se3_g)
    rg_o = rg[cam_idx]  # (O, 3, 3)
    tg_o = gt[cam_idx]

    pts = jnp.concatenate(
        [obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], axis=-1
    )  # (O, N, 3)
    n = pts.shape[1]
    p_base = pts @ rb.T + bt  # (O, N, 3) target points in base frame
    p_g = jnp.einsum("oij,onj->oni", jnp.swapaxes(rbo, -1, -2), p_base - tbo[:, None])
    p_c = jnp.einsum("oij,onj->oni", jnp.swapaxes(rg_o, -1, -2), p_g - tg_o[:, None])

    j_intr, h = jax.vmap(pinhole.project_point_jacobians)(intr[cam_idx], p_c)

    onehot = jnp.asarray(cam_idx[:, None] == jnp.arange(c)[None, :], x.dtype)  # (O, C)
    # intr: camera c's rows only touch camera c's intrinsics block
    j_intr_blk = jnp.einsum("onrp,oc->onrcp", j_intr, onehot).reshape(-1, n, 2, c * pc)
    # d p_c / d omega_g = [p_c]_x  (p_c(w) = exp(-w^) p_c)
    j_wg = jnp.einsum("onrj,onjk->onrk", h, se3.skew(p_c))
    j_wg_blk = jnp.einsum("onrk,oc->onrck", j_wg, onehot).reshape(-1, n, 2, 3 * c)
    # d p_c / d t_g = -R_g^T
    j_tg = -jnp.einsum("onrj,okj->onrk", h, rg_o)  # h @ (-rg_o^T)
    j_tg_blk = jnp.einsum("onrk,oc->onrck", j_tg, onehot).reshape(-1, n, 2, 3 * c)
    # d p_c / d omega_b = -R_cb R_b [p_t]_x with R_cb = R_g^T R_bo^T
    r_cb = jnp.einsum("oji,okj->oik", rg_o, rbo)  # rg_o^T @ rbo^T
    r_ct = jnp.einsum("oij,jk->oik", r_cb, rb)
    j_wb = -jnp.einsum("onrj,ojk,onkl->onrl", h, r_ct, se3.skew(pts))
    # d p_c / d t_b = R_cb
    j_tb = jnp.einsum("onrj,ojk->onrk", h, r_cb)

    jac = jnp.concatenate([j_intr_blk, j_wg_blk, j_tg_blk, j_wb, j_tb], axis=-1)
    jac = jac * mask[..., None, None]
    return jac.reshape(-1, jac.shape[-1])


def optimize_bundle_device(
    obj_xy,
    img_uv,
    b_se3_g,
    cam_idx,
    init_intrs,
    init_g_se3_c,
    init_b_se3_t,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: BundleOptions | None = None,
    precision: str = "f64",
    analytic_jac: bool = False,
):
    """Pure-jnp core.

    obj_xy/img_uv: (O, N, 2); b_se3_g: (O, 4, 4) constant gripper poses;
    cam_idx: (O,) int; init_intrs: (C, pc); init_g_se3_c: (C, 4, 4);
    init_b_se3_t: (4, 4); mask: (O, N).

    precision="mixed": float32 LM iterations then a float64 polish (see
    optimize_intrinsics_device).

    analytic_jac: opt-in hand-derived tangent Jacobian for the pinhole
    model (identical to jacfwd; measured slower on TPU v5e — see
    parallel/batched.py); non-pinhole models use jacfwd.
    """
    opts = opts or BundleOptions()
    o_cnt, n = obj_xy.shape[0], obj_xy.shape[1]
    c = jnp.asarray(init_intrs).shape[0]
    pc = model.param_count
    if mask is None:
        mask = jnp.ones((o_cnt, n), obj_xy.dtype)
    mask = jnp.asarray(mask, obj_xy.dtype)
    cam_idx = jnp.asarray(cam_idx, jnp.int32)

    gq, gt = blocks.poses_to_quat_tran(jnp.asarray(init_g_se3_c))
    bq = se3.rotmat_to_quat(se3.rot(jnp.asarray(init_b_se3_t)))
    bt = se3.tra(jnp.asarray(init_b_se3_t))
    x0 = jnp.concatenate(
        [jnp.asarray(init_intrs).reshape(-1), gq.reshape(-1), gt.reshape(-1), bq, bt]
    )
    manifold = make_manifold(pc, c)

    free = np.ones((x0.shape[0],), bool)
    o_int, o_gq, o_gt = 0, c * pc, c * pc + 4 * c
    o_bq, o_bt = c * pc + 7 * c, c * pc + 7 * c + 4
    if not opts.optimize_target_pose:
        free[o_bq : o_bt + 3] = False
    if not opts.optimize_hand_eye:
        free[o_gq : o_bq] = False
    if not opts.optimize_intrinsics:
        free[o_int : o_int + c * pc] = False
    elif not opts.optimize_skew:
        for ci in range(c):
            free[o_int + ci * pc + model.idx_skew] = False
    free = jnp.asarray(free)

    lower = np.full((x0.shape[0],), -np.inf)
    if opts.optimize_intrinsics:
        for ci in range(c):
            lower[o_int + ci * pc + model.idx_fx] = 0.0
            lower[o_int + ci * pc + model.idx_fy] = 0.0
    lower = jnp.asarray(lower)

    block_ids = jnp.repeat(jnp.arange(o_cnt, dtype=jnp.int32), 2 * n)
    b_se3_g = jnp.asarray(b_se3_g)
    res_fn = lambda x: _residual(model, x, obj_xy, img_uv, mask, b_se3_g, cam_idx, pc, c)
    use_analytic = analytic_jac and model.name == PINHOLE.name
    jac_fn = (
        (lambda x: _residual_jac_pinhole(x, obj_xy, img_uv, mask, b_se3_g, cam_idx, pc, c))
        if use_analytic
        else None
    )

    if precision == "mixed":
        args32 = [a.astype(jnp.float32) for a in (obj_xy, img_uv, mask, b_se3_g)]
        res32 = lambda x: _residual(model, x, args32[0], args32[1], args32[2], args32[3], cam_idx, pc, c)
        jac32 = (
            (lambda x: _residual_jac_pinhole(x, args32[0], args32[1], args32[2], args32[3], cam_idx, pc, c))
            if use_analytic
            else None
        )
        coarse = dataclasses.replace(
            opts.core, epsilon=max(1e-5, opts.core.epsilon),
            max_iterations=min(30, opts.core.max_iterations),
        )
        out32 = lm.lm_core(
            res32, x0.astype(jnp.float32), manifold, options=coarse, free_mask=free,
            block_ids=block_ids, num_blocks=o_cnt, lower=lower.astype(jnp.float32),
            jac_fn=jac32,
        )
        x0 = out32.x.astype(x0.dtype)

    out = lm.lm_core(
        res_fn, x0, manifold, options=opts.core, free_mask=free,
        block_ids=block_ids, num_blocks=o_cnt, lower=lower, jac_fn=jac_fn,
    )
    if opts.core.compute_covariance:
        cov, cov_ok = lm.covariance(
            res_fn, out.x, manifold, free_mask=free,
            block_ids=block_ids, num_blocks=o_cnt, huber_delta=opts.core.huber_delta,
            jac_fn=jac_fn,
        )
    else:
        # callers that disable covariance shouldn't pay the extra full-width
        # linearization + ambient solve (same gating as extrinsics.py:252)
        n_amb = manifold.ambient_dim
        cov = jnp.zeros((n_amb, n_amb), x0.dtype)
        cov_ok = jnp.asarray(False)

    intr, gqf, gtf, bqf, btf = unpack(out.x, pc, c)
    g_se3_c = blocks.quat_tran_to_poses(gqf, gtf)
    b_se3_t = se3.make_se3(se3.quat_to_rotmat(bqf), btf)
    return out, intr, g_se3_c, b_se3_t, cov, cov_ok


@dataclasses.dataclass
class BundleResult:
    core: OptimResult
    cameras: np.ndarray  # (C, pc)
    g_se3_c: np.ndarray  # (C, 4, 4)
    b_se3_t: np.ndarray  # (4, 4)


def optimize_bundle(
    obj_xy,
    img_uv,
    b_se3_g,
    cam_idx,
    initial_cameras,
    init_g_se3_c,
    init_b_se3_t,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: BundleOptions | None = None,
    analytic_jac: bool = False,
):
    opts = opts or BundleOptions()
    initial_cameras = jnp.asarray(initial_cameras)
    if initial_cameras.shape[0] == 0:
        raise ValueError("No camera intrinsics provided")
    if jnp.asarray(obj_xy).shape[0] == 0:
        raise ValueError("No observations provided")
    out, intr, g_se3_c, b_se3_t, cov, cov_ok = optimize_bundle_device(
        jnp.asarray(obj_xy), jnp.asarray(img_uv), jnp.asarray(b_se3_g),
        jnp.asarray(cam_idx), initial_cameras, jnp.asarray(init_g_se3_c),
        jnp.asarray(init_b_se3_t), mask=mask, model=model, opts=opts,
        analytic_jac=analytic_jac,
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
    return BundleResult(
        core=core, cameras=np.asarray(intr), g_se3_c=np.asarray(g_se3_c),
        b_se3_t=np.asarray(b_se3_t),
    )
