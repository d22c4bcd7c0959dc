"""Joint multi-camera extrinsics (+ optional intrinsics) refinement
(reference: src/estimation/optim/extrinsics.cpp +
residuals/extrinsicsresidual.h).

Parameter layout follows ExtrinsicBlocks::get_param_blocks order
(extrinsics.cpp:54-72): [intr_0..intr_C, cam_quat_0.., cam_tran_0..,
view_quat_0.., view_tran_0..]. Gauge fixing by free-mask
(extrinsics.cpp:118-139): camera 0 pose constant when optimizing extrinsics;
target pose 0 constant when optimizing intrinsics.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models.registry import PINHOLE, CameraModelSpec
from ..ops import se3
from . import blocks, lm, lm_schur
from .core import OptimOptions, OptimResult, TerminationType, brief_report
from .manifold import ProductManifold, euclid, quat


@dataclasses.dataclass(frozen=True)
class ExtrinsicOptions:
    """Mirrors include/calib/estimation/optim/extrinsics.h:24-30."""

    core: OptimOptions = dataclasses.field(default_factory=OptimOptions)
    optimize_intrinsics: bool = True
    optimize_skew: bool = False
    optimize_extrinsics: bool = True


def make_manifold(pc: int, c: int, v: int) -> ProductManifold:
    return ProductManifold(
        [euclid(pc)] * c + [quat()] * c + [euclid(3)] * c + [quat()] * v + [euclid(3)] * v
    )


def unpack(x, pc, c, v):
    o = 0
    intr = x[o : o + c * pc].reshape(c, pc); o += c * pc
    cq = x[o : o + 4 * c].reshape(c, 4); o += 4 * c
    ct = x[o : o + 3 * c].reshape(c, 3); o += 3 * c
    vq = x[o : o + 4 * v].reshape(v, 4); o += 4 * v
    vt = x[o : o + 3 * v].reshape(v, 3)
    return intr, cq, ct, vq, vt


def _view_residual(model, xg, vq_i, vt_i, obj_v, uv_v, mask_v, pc, c):
    """One target view seen by all C cameras — the separable unit for the
    Schur engine (global = intrinsics + camera poses; per-view = target
    pose). Row order matches _residual's (C, N, 2) slice for this view."""
    intr = xg[: c * pc].reshape(c, pc)
    cq = xg[c * pc : c * pc + 4 * c].reshape(c, 4)
    ct = xg[c * pc + 4 * c :].reshape(c, 3)
    cam_rot = se3.quat_to_rotmat(cq)  # (C, 3, 3)
    view_rot = se3.quat_to_rotmat(vq_i)  # (3, 3)
    rot_c = jnp.einsum("cij,jk->cik", cam_rot, view_rot)
    tra_c = jnp.einsum("cij,j->ci", cam_rot, vt_i) + ct
    pts = jnp.concatenate([obj_v, jnp.zeros(obj_v.shape[:-1] + (1,), obj_v.dtype)], -1)
    pc3 = jnp.einsum("cij,cnj->cni", rot_c, pts) + tra_c[:, None, :]
    uv_hat = model.project(intr[:, None, :], pc3)
    return ((uv_hat - uv_v) * mask_v[..., None]).reshape(-1)


def _skew3(p):
    """[p]_x for general 3-vectors: (..., 3) -> (..., 3, 3)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        axis=-2,
    )


def _skew_z0(pts):
    """[p]_x for planar target points p = (px, py, 0)."""
    px, py = pts[..., 0], pts[..., 1]
    z = jnp.zeros_like(px)
    return jnp.stack(
        [
            jnp.stack([z, z, py], -1),
            jnp.stack([z, z, -px], -1),
            jnp.stack([-py, px, z], -1),
        ],
        axis=-2,
    )


def _view_residual_jac_pinhole(xg, vq_i, vt_i, obj_v, uv_v, mask_v, pc, c):
    """Analytic tangent Jacobian of ``_view_residual`` for the PINHOLE model.

    Returns (C*N*2, C*pc + 6C + 6): global tangent columns in the
    g_manifold layout [intr_0..intr_C, omega_cam x C, t_cam x C] followed
    by the per-view [omega_v(3), t_v(3)]. Hand-derived chain rule of
    project(intr_c, R_c (R_v exp(w_v^) p + t_v + dt_v) + t_c) with
    right-multiplied quaternion retractions on both poses (the repo's
    ProductManifold / Schur-view convention; equals jacfwd — tested).
    Reference analogue: the Jets flowing through ExtrinsicResidual
    (residuals/extrinsicsresidual.h:22-60).
    """
    import jax

    from ..models import pinhole

    intr = xg[: c * pc].reshape(c, pc)
    cq = xg[c * pc : c * pc + 4 * c].reshape(c, 4)
    cam_rot = se3.quat_to_rotmat(cq)  # (C, 3, 3)
    ct = xg[c * pc + 4 * c :].reshape(c, 3)
    view_rot = se3.quat_to_rotmat(vq_i)
    pts = jnp.concatenate(
        [obj_v, jnp.zeros(obj_v.shape[:-1] + (1,), obj_v.dtype)], axis=-1
    )  # (C, N, 3)
    n = pts.shape[1]
    p_r = jnp.einsum("ij,cnj->cni", view_rot, pts) + vt_i  # rig-frame points
    pc3 = jnp.einsum("cij,cnj->cni", cam_rot, p_r) + ct[:, None, :]
    rot_c = jnp.einsum("cij,jk->cik", cam_rot, view_rot)

    j_intr, h = jax.vmap(pinhole.project_point_jacobians)(intr, pc3)

    eye_c = jnp.eye(c, dtype=xg.dtype)
    # block-diagonal scatter: camera c's rows only touch camera c's columns
    j_intr_blk = jnp.einsum("cnrp,cd->cnrdp", j_intr, eye_c).reshape(c, n, 2, c * pc)
    m_wc = -jnp.einsum("cij,cnjk->cnik", cam_rot, _skew3(p_r))
    j_wc = jnp.einsum("cnrj,cnjk->cnrk", h, m_wc)
    j_wc_blk = jnp.einsum("cnrk,cd->cnrdk", j_wc, eye_c).reshape(c, n, 2, 3 * c)
    j_tc_blk = jnp.einsum("cnrk,cd->cnrdk", h, eye_c).reshape(c, n, 2, 3 * c)
    m_wv = -jnp.einsum("cij,cnjk->cnik", rot_c, _skew_z0(pts))
    j_wv = jnp.einsum("cnrj,cnjk->cnrk", h, m_wv)
    j_tv = jnp.einsum("cnrj,cjk->cnrk", h, cam_rot)

    jac = jnp.concatenate([j_intr_blk, j_wc_blk, j_tc_blk, j_wv, j_tv], axis=-1)
    jac = jac * mask_v[..., None, None]
    return jac.reshape(-1, jac.shape[-1])


def _view_residual_jac_grouped(model, xg, vq_i, vt_i, obj_v, uv_v, mask_v, pc, c):
    """Per-camera-grouped jacfwd Jacobian of ``_view_residual`` — model
    generic, exact (same retraction chain as the engine's res_local).

    The per-view residual is block-sparse across cameras: camera c's rows
    have zero derivative w.r.t. every other camera's intrinsics and pose,
    but the engine's generic jacfwd pushes the full C*(pc+6)+6 tangent
    through every row (38 tangents for a 2-camera pinhole rig, ~45%
    structural zeros). Here each camera's rows get their own jacfwd over
    only [intr_c (pc), omega_c (3), t_c (3), omega_v (3), t_v (3)] —
    pc+12 = 22 tangents — and the blocks scatter into the dense
    (C*N*2, C*pc+6C+6) layout with a static block-diagonal einsum (the
    same scatter `_view_residual_jac_pinhole` uses). Forward-op work in
    the Jacobian drops by (pc+12)/(C(pc+6)+6) — 1.7x for stereo, more for
    wider rigs — while staying dot_general-shaped for the MXU (the
    hand-derived analytic chain is VPU elementwise work and measured
    slower; parallel/batched.py ANALYTIC_JAC_MAX_BATCH).

    Exactness contract (lm_schur jac_view_fn): identical retractions —
    euclid add on intrinsics/translations, right-multiplied normalized
    quaternion updates on both poses. Box bounds (fx, fy >= 0) are
    inactive at every seed this library produces (DLT seeds, fx ~ 10^2);
    the pinhole analytic hook ships under the same assumption.
    """
    import jax

    intr = xg[: c * pc].reshape(c, pc)
    cq = xg[c * pc : c * pc + 4 * c].reshape(c, 4)
    ct = xg[c * pc + 4 * c :].reshape(c, 3)
    n = obj_v.shape[1]

    def res_cam(delta, intr_c, cq_c, ct_c, obj_c, uv_c, mask_c):
        intr_n = intr_c + delta[:pc]
        dqc = se3.exp_quat(delta[pc : pc + 3])
        cqn = se3.quat_mul(cq_c, dqc)
        cqn = cqn / jnp.linalg.norm(cqn)
        ctn = ct_c + delta[pc + 3 : pc + 6]
        dqv = se3.exp_quat(delta[pc + 6 : pc + 9])
        vqn = se3.quat_mul(vq_i, dqv)
        vqn = vqn / jnp.linalg.norm(vqn)
        vtn = vt_i + delta[pc + 9 :]
        cam_rot = se3.quat_to_rotmat(cqn)
        view_rot = se3.quat_to_rotmat(vqn)
        rot_c = cam_rot @ view_rot
        tra_c = cam_rot @ vtn + ctn
        pts = jnp.concatenate(
            [obj_c, jnp.zeros(obj_c.shape[:-1] + (1,), obj_c.dtype)], -1
        )
        pc3 = jnp.einsum("ij,nj->ni", rot_c, pts) + tra_c
        uv_hat = model.project(intr_n[None, :], pc3)
        return ((uv_hat - uv_c) * mask_c[..., None]).reshape(-1)

    zero = jnp.zeros((pc + 12,), xg.dtype)
    jac_c = jax.vmap(
        lambda i_, q_, t_, o_, u_, m_: jax.jacfwd(res_cam)(zero, i_, q_, t_, o_, u_, m_)
    )(intr, cq, ct, obj_v, uv_v, mask_v)  # (C, N*2, pc+12)

    eye_c = jnp.eye(c, dtype=xg.dtype)
    m = 2 * n
    j_intr = jnp.einsum("cmp,cd->cmdp", jac_c[..., :pc], eye_c).reshape(c, m, c * pc)
    j_wc = jnp.einsum("cmk,cd->cmdk", jac_c[..., pc : pc + 3], eye_c).reshape(c, m, 3 * c)
    j_tc = jnp.einsum("cmk,cd->cmdk", jac_c[..., pc + 3 : pc + 6], eye_c).reshape(c, m, 3 * c)
    jac = jnp.concatenate(
        [j_intr, j_wc, j_tc, jac_c[..., pc + 6 : pc + 9], jac_c[..., pc + 9 :]],
        axis=-1,
    )
    return jac.reshape(c * m, -1)


def _residual(model, x, obj_xy, img_uv, mask, pc, c, v):
    intr, cq, ct, vq, vt = unpack(x, pc, c, v)
    cam_rot = se3.quat_to_rotmat(cq)  # (C, 3, 3)
    view_rot = se3.quat_to_rotmat(vq)  # (V, 3, 3)
    # c_se3_t = c_se3_r @ r_se3_t  (extrinsicsresidual.h:17-24)
    rot_vc = jnp.einsum("cij,vjk->vcik", cam_rot, view_rot)
    tra_vc = jnp.einsum("cij,vj->vci", cam_rot, vt) + ct[None, :, :]
    pts = jnp.concatenate([obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], -1)
    pc3 = jnp.einsum("vcij,vcnj->vcni", rot_vc, pts) + tra_vc[:, :, None, :]
    uv_hat = model.project(intr[None, :, None, :], pc3)
    r = (uv_hat - img_uv) * mask[..., None]
    return r.reshape(-1)


def optimize_extrinsics_device(
    obj_xy,
    img_uv,
    init_intrs,
    init_c_se3_r,
    init_r_se3_t,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: ExtrinsicOptions | None = None,
    solver: str = "schur",
    analytic_jac: bool = False,
    jac_mode: str = "grouped",
):
    """Pure-jnp core. obj_xy/img_uv: (V, C, N, 2); init_intrs: (C, pc);
    init_c_se3_r: (C, 4, 4); init_r_se3_t: (V, 4, 4); mask: (V, C, N).

    solver="schur" (default) eliminates the per-view target poses by exact
    block elimination (optim.lm_schur with a manifold-valued global block:
    C intrinsics + C camera quaternion poses; Huber blocks per (view, cam)
    pair). "dense" falls back to the generic engine.

    analytic_jac: opt-in hand-derived per-view Jacobians for the pinhole
    model in the Schur engine (identical to jacfwd; measured slower on
    TPU v5e — see parallel/batched.py); non-pinhole models use jacfwd.

    jac_mode (schur path, when analytic_jac is off): "grouped" (default)
    computes the per-view Jacobian with one jacfwd PER CAMERA over that
    camera's pc+12-dim tangent and scatters the blocks (the per-view
    residual is block-sparse across cameras — the generic full-width
    jacfwd pushes C(pc+6)+6 tangents with ~45% structural zeros for
    stereo); "full" keeps the generic full-width jacfwd.
    """
    opts = opts or ExtrinsicOptions()
    v, c, n = obj_xy.shape[0], obj_xy.shape[1], obj_xy.shape[2]
    pc = model.param_count
    if mask is None:
        mask = jnp.ones((v, c, n), obj_xy.dtype)
    mask = jnp.asarray(mask, obj_xy.dtype)

    cq, ct = blocks.poses_to_quat_tran(jnp.asarray(init_c_se3_r))
    vq, vt = blocks.poses_to_quat_tran(jnp.asarray(init_r_se3_t))
    x0 = jnp.concatenate(
        [jnp.asarray(init_intrs).reshape(-1), cq.reshape(-1), ct.reshape(-1),
         vq.reshape(-1), vt.reshape(-1)]
    )
    manifold = make_manifold(pc, c, v)

    free = np.ones((x0.shape[0],), bool)
    o_int, o_cq, o_ct = 0, c * pc, c * pc + 4 * c
    o_vq, o_vt = c * pc + 7 * c, c * pc + 7 * c + 4 * v
    if not opts.optimize_intrinsics:
        free[o_int : o_int + c * pc] = False
    else:
        # gauge: first target pose constant (extrinsics.cpp:124-127)
        free[o_vq : o_vq + 4] = False
        free[o_vt : o_vt + 3] = False
    if not opts.optimize_extrinsics:
        free[o_cq : o_vq] = False
    else:
        # gauge: camera 0 pose constant (extrinsics.cpp:134-138)
        free[o_cq : o_cq + 4] = False
        free[o_ct : o_ct + 3] = False
    if not opts.optimize_skew:
        for ci in range(c):
            free[o_int + ci * pc + model.idx_skew] = False
    free = jnp.asarray(free)

    lower = np.full((x0.shape[0],), -np.inf)
    for ci in range(c):
        lower[o_int + ci * pc + model.idx_fx] = 0.0
        lower[o_int + ci * pc + model.idx_fy] = 0.0
    lower = jnp.asarray(lower)

    block_ids = jnp.repeat(jnp.arange(v * c, dtype=jnp.int32), 2 * n)
    res_fn = lambda x: _residual(model, x, obj_xy, img_uv, mask, pc, c, v)
    if solver == "schur":
        ga = c * pc + 7 * c
        g_manifold = ProductManifold(
            [euclid(pc)] * c + [quat()] * c + [euclid(3)] * c
        )
        res_view = lambda xg, q, t, o, u, m: _view_residual(
            model, xg, q, t, o, u, m, pc, c
        )
        if analytic_jac and model.name == PINHOLE.name:
            jac_view = lambda xg, q, t, o, u, m: _view_residual_jac_pinhole(
                xg, q, t, o, u, m, pc, c
            )
        elif jac_mode == "grouped":
            # per-camera-grouped jacfwd: pc+12 tangents per camera instead
            # of C(pc+6)+6 through every row (see _view_residual_jac_grouped)
            jac_view = lambda xg, q, t, o, u, m: _view_residual_jac_grouped(
                model, xg, q, t, o, u, m, pc, c
            )
        else:
            jac_view = None
        # per-view pose freezing doubles as the target-0 gauge fix
        view_free = jnp.asarray(free[o_vq : o_vq + 4 * v].reshape(v, 4)[:, 0], x0.dtype)
        sout = lm_schur.lm_core_schur(
            res_view, x0[:ga], vq, vt, (obj_xy, img_uv, mask),
            options=opts.core, g_free=free[:ga], view_valid=view_free,
            lower_g=lower[:ga], g_manifold=g_manifold, blocks_per_view=c,
            jac_view_fn=jac_view,
        )
        pack = lambda xg, q, t: jnp.concatenate(
            [xg, q.reshape(-1), t.reshape(-1)]
        )
        out = sout.as_lm_output(pack)
        if opts.core.compute_covariance:
            # exact block inversion of the separable gram (see
            # lm_schur.tangent_covariance; full_jacobian's dense assembly +
            # full-width Cholesky is the path this replaces)
            tan_free = manifold.ambient_to_tangent_mask(free).astype(x0.dtype)
            c_t, _ = lm_schur.tangent_covariance(
                res_view, sout.xg, sout.quats, sout.trans,
                (obj_xy, img_uv, mask), g_manifold=g_manifold,
                jac_view_fn=jac_view, tan_free=tan_free,
                huber_delta=opts.core.huber_delta, blocks_per_view=c,
            )
            cov, cov_ok = lm.covariance_from_tangent(c_t, out.x, manifold)
        else:
            n_amb = manifold.ambient_dim
            cov = jnp.zeros((n_amb, n_amb), x0.dtype)
            cov_ok = jnp.asarray(False)
    else:
        out = lm.lm_core(
            res_fn, x0, manifold, options=opts.core, free_mask=free,
            block_ids=block_ids, num_blocks=v * c, lower=lower,
        )
        cov, cov_ok = lm.covariance(
            res_fn, out.x, manifold, free_mask=free,
            block_ids=block_ids, num_blocks=v * c, huber_delta=opts.core.huber_delta,
        )

    intr, cqf, ctf, vqf, vtf = unpack(out.x, pc, c, v)
    c_se3_r = blocks.quat_tran_to_poses(cqf, ctf)
    r_se3_t = blocks.quat_tran_to_poses(vqf, vtf)
    return out, intr, c_se3_r, r_se3_t, cov, cov_ok


@dataclasses.dataclass
class ExtrinsicOptimizationResult:
    core: OptimResult
    cameras: np.ndarray  # (C, pc)
    c_se3_r: np.ndarray  # (C, 4, 4)
    r_se3_t: np.ndarray  # (V, 4, 4)


def optimize_extrinsics(
    obj_xy,
    img_uv,
    init_cameras,
    init_c_se3_r,
    init_r_se3_t,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: ExtrinsicOptions | None = None,
    solver: str = "schur",
    analytic_jac: bool = False,
):
    opts = opts or ExtrinsicOptions()
    init_cameras = jnp.asarray(init_cameras)
    if init_cameras.shape[0] != jnp.asarray(init_c_se3_r).shape[0]:
        raise ValueError("Incompatible pose vector sizes for joint optimization")
    out, intr, c_se3_r, r_se3_t, cov, cov_ok = optimize_extrinsics_device(
        jnp.asarray(obj_xy), jnp.asarray(img_uv), init_cameras,
        jnp.asarray(init_c_se3_r), jnp.asarray(init_r_se3_t),
        mask=mask, model=model, opts=opts, solver=solver,
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
    return ExtrinsicOptimizationResult(
        core=core, cameras=np.asarray(intr), c_se3_r=np.asarray(c_se3_r),
        r_se3_t=np.asarray(r_se3_t),
    )
