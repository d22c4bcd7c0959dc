"""Joint intrinsics + per-view pose refinement, generic over camera model
(reference: src/estimation/optim/intrinsics.cpp + residuals/intrinsicresidual.h).

Parameter layout (covariance-compatible with IntrinsicBlocks order,
intrinsics.cpp:36-52): [intr(pc), quat_0..quat_V, t_0..t_V]. One Huber block
per view (one AddResidualBlock per view, intrinsics.cpp:69-76). fx, fy get a
zero lower bound; skew is frozen unless ``optimize_skew``
(intrinsics.cpp:78-88).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models import CalibrationBounds
from ..models.registry import PINHOLE, CameraModelSpec
from ..ops import se3
from . import blocks, lm, lm_schur
from .core import OptimOptions, OptimResult, TerminationType, brief_report
from .manifold import ProductManifold, euclid, quat


@dataclasses.dataclass(frozen=True)
class IntrinsicsOptimOptions:
    """Mirrors include/calib/estimation/optim/intrinsics.h:15-22."""

    core: OptimOptions = dataclasses.field(default_factory=OptimOptions)
    num_radial: int = 2
    optimize_skew: bool = False
    bounds: CalibrationBounds | None = None
    fixed_distortion_indices: tuple = ()
    fixed_distortion_values: tuple = ()
    # coarse-phase tolerance for precision="mixed"/"mixed_jac": how far the
    # f32(-Jacobian) phase runs before the f64 polish takes over. Too tight
    # wastes iterations grinding at the f32 floor (linear convergence); too
    # loose shifts work onto the expensive f64 phase. Tuned by sweep
    # (benchmarks/exp_mixed_jac.py); never looser than core.epsilon.
    mixed_coarse_epsilon: float = 1e-4


def make_manifold(pc: int, num_views: int) -> ProductManifold:
    return ProductManifold([euclid(pc)] + [quat()] * num_views + [euclid(3)] * num_views)


def reproject_residuals(model: CameraModelSpec, intr, quats, trans, obj_xy, img_uv, mask):
    """(V, N, 2) masked pixel residuals for all views."""
    rot = se3.quat_to_rotmat(quats)  # (V, 3, 3)
    pts = jnp.concatenate([obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], axis=-1)
    pc3 = jnp.einsum("vij,vnj->vni", rot, pts) + trans[:, None, :]
    uv_hat = model.project(intr[None, None, :], pc3)
    return (uv_hat - img_uv) * mask[..., None]


def _residual_flat(model, x, obj_xy, img_uv, mask, pc, v):
    intr, quats, trans = blocks.unpack_intr_quats_trans(x, pc, v)
    r = reproject_residuals(model, intr, quats, trans, obj_xy, img_uv, mask)
    return r.reshape(-1)


def _view_residual(model, intr, quat_i, tran_i, obj_i, uv_i, mask_i):
    """One view's masked pixel residuals (the separable-block unit the
    Schur engine vmaps over)."""
    rot = se3.quat_to_rotmat(quat_i)
    pts = jnp.concatenate(
        [obj_i, jnp.zeros(obj_i.shape[:-1] + (1,), obj_i.dtype)], axis=-1
    )
    pc3 = pts @ rot.T + tran_i
    uv_hat = model.project(intr[None, :], pc3)
    return ((uv_hat - uv_i) * mask_i[..., None]).reshape(-1)


def _view_residual_jac_pinhole(intr, quat_i, tran_i, obj_i, uv_i, mask_i):
    """Analytic tangent Jacobian of ``_view_residual`` for the PINHOLE model.

    Returns (2N, 16): columns [fx, fy, cx, cy, skew, k1, k2, k3, p1, p2,
    omega(3), dt(3)], rows interleaved (u, v) per point — exactly the
    jacfwd of the Schur engine's retracted residual at zero tangent
    (equivalence-tested in tests/test_lm_solvers.py). Hand-derived chain
    rule of project(intr, R exp(omega^) p + t + dt): the same ~30-flop
    kernel Ceres differentiates with Jets (SURVEY.md section 3.5) with
    ~1/16 the arithmetic of the 16-tangent jacfwd — but measured SLOWER
    on this chip (jacfwd rides the MXU bf16 f64-emulation; see
    parallel/batched.py::ANALYTIC_JAC_MAX_BATCH), so it is opt-in.

    Rotation convention: right-multiplied quaternion retraction
    q (x) exp_quat(omega) == R exp(omega^), so d p_c / d omega = -R [p]_x.
    Assumes the fx/fy >= 0 box bounds are inactive (interior), matching
    Ceres' unconstrained-interior linearization.
    """
    from ..models import pinhole

    rot = se3.quat_to_rotmat(quat_i)
    pts = jnp.concatenate(
        [obj_i, jnp.zeros(obj_i.shape[:-1] + (1,), obj_i.dtype)], axis=-1
    )
    pc = pts @ rot.T + tran_i  # (N, 3)
    j_intr, h = pinhole.project_point_jacobians(intr, pc)

    # d p_c / d omega = -R [p]_x ; p = (px, py, 0)
    j_rot = jnp.einsum("nrj,jk,nkl->nrl", h, -rot, _skew_z0(pts))

    jac = jnp.concatenate([j_intr, j_rot, h], axis=-1)  # (N, 2, 16)
    jac = jac * mask_i[..., None, None]
    return jac.reshape(-1, jac.shape[-1])


def _skew_z0(pts):
    """[p]_x for planar target points p = (px, py, 0): (N, 3, 3)."""
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


def _free_mask(model, opts: IntrinsicsOptimOptions, fixed_slots, pc, v, view_valid):
    """Ambient free mask: skew frozen unless optimize_skew, fixed distortion
    slots frozen, padded views' pose blocks frozen."""
    free = np.ones((pc + 7 * v,), bool)
    if not opts.optimize_skew:
        free[model.idx_skew] = False
    for slot in fixed_slots:
        free[model.idx_dist0 + slot] = False
    free = jnp.asarray(free)
    if view_valid is not None:
        vv = jnp.asarray(view_valid, bool)
        pose_free = jnp.concatenate([jnp.repeat(vv, 4), jnp.repeat(vv, 3)])
        free = free & jnp.concatenate([jnp.ones((pc,), bool), pose_free])
    return free


def _fixed_slot_list(model, opts: IntrinsicsOptimOptions):
    """Packed distortion slots for opts.fixed_distortion_indices (reference
    [k1..k_nr, p1, p2] index semantics; validated)."""
    nr = opts.num_radial
    slots = []
    for idx in opts.fixed_distortion_indices:
        if idx < 0 or idx >= nr + 2:
            raise ValueError("Fixed distortion index out of range")
        slots.append(idx if idx < nr else 3 + (idx - nr))
    return slots


def intrinsics_covariance_device(
    obj_xy,
    img_uv,
    intr,
    poses,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: IntrinsicsOptimOptions | None = None,
    view_valid=None,
):
    """Ambient covariance at a GIVEN solution — the Schur block-inverse path
    of ``optimize_intrinsics_device``, callable separately so multi-phase
    batched solves can defer covariance to one final pass. Returns
    (cov (pc+7V, pc+7V), cov_ok)."""
    opts = opts or IntrinsicsOptimOptions()
    v = obj_xy.shape[0]
    pc = model.param_count
    if mask is None:
        mask = jnp.ones(obj_xy.shape[:-1], obj_xy.dtype)
    mask = jnp.asarray(mask, obj_xy.dtype)
    if view_valid is not None:
        mask = mask * jnp.asarray(view_valid, mask.dtype)[:, None]
    manifold = make_manifold(pc, v)
    free = _free_mask(model, opts, _fixed_slot_list(model, opts), pc, v, view_valid)
    quats, trans = blocks.poses_to_quat_tran(jnp.asarray(poses))
    x = blocks.pack_intr_quats_trans(jnp.asarray(intr), quats, trans)
    tan_free = manifold.ambient_to_tangent_mask(free).astype(x.dtype)
    c_t, _ = lm_schur.tangent_covariance(
        lambda i, q, t, o, u, m: _view_residual(model, i, q, t, o, u, m),
        jnp.asarray(intr), quats, trans, (jnp.asarray(obj_xy), jnp.asarray(img_uv), mask),
        jac_view_fn=None, tan_free=tan_free, huber_delta=opts.core.huber_delta,
    )
    return lm.covariance_from_tangent(c_t, x, manifold)


def _bounds_vectors(pc, v, model, opts: IntrinsicsOptimOptions, dtype):
    lower = jnp.full((pc + 7 * v,), -jnp.inf, dtype)
    lower = lower.at[model.idx_fx].set(0.0).at[model.idx_fy].set(0.0)
    return lower, None


def optimize_intrinsics_device(
    obj_xy,
    img_uv,
    init_intr,
    init_poses,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: IntrinsicsOptimOptions | None = None,
    precision: str = "f64",
    view_valid=None,
    solver: str = "schur",
    analytic_jac: bool = False,
):
    """Pure-jnp core. obj_xy/img_uv: (V, N, 2); init_intr: (pc,);
    init_poses: (V, 4, 4); mask: (V, N).

    analytic_jac: opt-in hand-derived per-view Jacobian for the pinhole
    model in the Schur engine (identical values to jacfwd; measured slower
    on TPU v5e where jacfwd rides the MXU f64-emulation — see
    parallel/batched.py); non-pinhole models always use jacfwd.

    precision="mixed" runs most LM iterations in float32 (native TPU speed;
    the Jacobi-scaled normal equations keep the f32 Cholesky conditioned)
    and polishes in float64 to the full epsilon — same accuracy, a fraction
    of the f64-emulation cost.

    view_valid: optional (V,) dynamic validity — padded views (shape
    bucketing) get zero residuals and frozen pose blocks, so one compiled
    program serves any view count up to V without recompiling.

    solver="schur" (default) exploits the intrinsics+per-view-pose block
    structure via optim.lm_schur (DENSE_SCHUR equivalent): per-view
    vmapped Jacobians and exact block elimination — algebraically the same
    iteration as the dense engine, a fraction of the work. "dense" falls
    back to the generic lm.lm_core.
    """
    opts = opts or IntrinsicsOptimOptions()
    v, n = obj_xy.shape[0], obj_xy.shape[1]
    pc = model.param_count
    if mask is None:
        mask = jnp.ones((v, n), obj_xy.dtype)
    mask = jnp.asarray(mask, obj_xy.dtype)
    if view_valid is not None:
        mask = mask * jnp.asarray(view_valid, mask.dtype)[:, None]

    init_intr = jnp.asarray(init_intr)
    # freeze the requested Brown-Conrady coefficients at their assigned
    # values (default 0, matching semidlt/fit_distortion_full semantics:
    # indices address the [k1..k_nr, p1, p2] vector of length num_radial+2,
    # NOT the fixed 5-slot packed [k1,k2,k3,p1,p2]). Beyond reference parity
    # — intrinsics.h:18-19 declares the fields but intrinsics.cpp never
    # reads them — this is ALSO the cure for the tilt/tangential degeneracy:
    # a Scheimpflug solve with free p1/p2 wanders a cost-flat tau~p1/p2
    # valley for 10-58 linearizations vs pinhole's 5-6 (measured); fixing
    # p1=p2=0 (the reference's own Scheimpflug camera configuration,
    # scheimpflug_test.cpp:17-18 two-coefficient distortion) makes tilt
    # identifiable and restores pinhole-class convergence.
    fixed_slots = _fixed_slot_list(model, opts)
    for i, slot in enumerate(fixed_slots):
        val = (
            opts.fixed_distortion_values[i]
            if i < len(opts.fixed_distortion_values)
            else 0.0
        )
        init_intr = init_intr.at[model.idx_dist0 + slot].set(val)
    quats, trans = blocks.poses_to_quat_tran(jnp.asarray(init_poses))
    x0 = blocks.pack_intr_quats_trans(init_intr, quats, trans)
    manifold = make_manifold(pc, v)
    free = _free_mask(model, opts, fixed_slots, pc, v, view_valid)

    lower, upper = _bounds_vectors(pc, v, model, opts, x0.dtype)
    block_ids = jnp.repeat(jnp.arange(v, dtype=jnp.int32), 2 * n)

    res_fn = lambda x: _residual_flat(model, x, obj_xy, img_uv, mask, pc, v)

    if solver == "schur":
        res_view = lambda intr, q, t, o, u, m: _view_residual(model, intr, q, t, o, u, m)
        jac_view = (
            _view_residual_jac_pinhole
            if (analytic_jac and model.name == PINHOLE.name)
            else None
        )
        gmask = jnp.asarray(free[:pc], x0.dtype)
        lower_g = None if lower is None else lower[:pc]
        intr_c, quats_c, trans_c = jnp.asarray(init_intr), quats, trans
        if precision == "mixed_jac":
            # f32 Jacobian/gram phase (f64 iterate + cost — every accepted
            # step is a true f64 descent), then a short full-f64 polish to
            # the caller's epsilon. The f32 phase moves the per-iteration
            # FLOPs bulk (jacfwd tangents + gram einsums) from bf16 f64
            # -emulation to native f32 MXU throughput.
            coarse = dataclasses.replace(
                opts.core, epsilon=max(opts.mixed_coarse_epsilon, opts.core.epsilon),
                max_iterations=min(30, opts.core.max_iterations),
            )
            s32 = lm_schur.lm_core_schur(
                res_view, intr_c, quats_c, trans_c,
                (obj_xy, img_uv, mask),
                options=coarse, g_free=gmask, view_valid=view_valid,
                lower_g=lower_g, jac_view_fn=jac_view,
                jac_dtype=jnp.float32,
            )
            intr_c, quats_c, trans_c = s32.xg, s32.quats, s32.trans
        if precision == "mixed":
            coarse = dataclasses.replace(
                opts.core, epsilon=max(opts.mixed_coarse_epsilon, opts.core.epsilon),
                max_iterations=min(30, opts.core.max_iterations),
            )
            s32 = lm_schur.lm_core_schur(
                res_view,
                intr_c.astype(jnp.float32),
                quats_c.astype(jnp.float32),
                trans_c.astype(jnp.float32),
                (
                    obj_xy.astype(jnp.float32),
                    img_uv.astype(jnp.float32),
                    mask.astype(jnp.float32),
                ),
                options=coarse,
                g_free=gmask,
                view_valid=view_valid,
                lower_g=None if lower_g is None else lower_g.astype(jnp.float32),
                jac_view_fn=jac_view,
            )
            intr_c = s32.xg.astype(x0.dtype)
            quats_c = s32.quats.astype(x0.dtype)
            trans_c = s32.trans.astype(x0.dtype)
        sout = lm_schur.lm_core_schur(
            res_view, intr_c, quats_c, trans_c, (obj_xy, img_uv, mask),
            options=opts.core, g_free=gmask, view_valid=view_valid,
            lower_g=lower_g, jac_view_fn=jac_view,
        )
        out = sout.as_lm_output(blocks.pack_intr_quats_trans)
    else:
        if precision == "mixed":
            obj32 = obj_xy.astype(jnp.float32)
            uv32 = img_uv.astype(jnp.float32)
            mask32 = mask.astype(jnp.float32)
            res32 = lambda x: _residual_flat(model, x, obj32, uv32, mask32, pc, v)
            coarse = dataclasses.replace(
                opts.core, epsilon=max(opts.mixed_coarse_epsilon, opts.core.epsilon),
                max_iterations=min(30, opts.core.max_iterations),
            )
            out32 = lm.lm_core(
                res32, x0.astype(jnp.float32), manifold, options=coarse,
                free_mask=free, block_ids=block_ids, num_blocks=v,
                lower=None if lower is None else lower.astype(jnp.float32),
                upper=None if upper is None else upper.astype(jnp.float32),
            )
            x0 = out32.x.astype(x0.dtype)

        out = lm.lm_core(
            res_fn,
            x0,
            manifold,
            options=opts.core,
            free_mask=free,
            block_ids=block_ids,
            num_blocks=v,
            lower=lower,
            upper=upper,
        )
    if opts.core.compute_covariance:
        if solver == "schur":
            # exact block inversion of the separable gram — never assembles
            # the (2NV, pc+6V) Jacobian or runs the (pc+6V)-wide Cholesky
            # (the dense covariance tail was 23% of the B=256 solve,
            # benchmarks/exp_stage_cost.py round 3)
            tan_free = manifold.ambient_to_tangent_mask(free).astype(x0.dtype)
            c_t, _ = lm_schur.tangent_covariance(
                lambda intr, q, t, o, u, m: _view_residual(model, intr, q, t, o, u, m),
                sout.xg, sout.quats, sout.trans, (obj_xy, img_uv, mask),
                jac_view_fn=jac_view, tan_free=tan_free,
                huber_delta=opts.core.huber_delta,
            )
            cov, cov_ok = lm.covariance_from_tangent(c_t, out.x, manifold)
        else:
            cov, cov_ok = lm.covariance(
                res_fn, out.x, manifold, free_mask=free,
                block_ids=block_ids, num_blocks=v, huber_delta=opts.core.huber_delta,
            )
    else:
        # callers that disable covariance shouldn't pay the extra full-width
        # linearization (one pc+7V-tangent jacfwd + inverse per solve)
        n_amb = pc + 7 * v
        cov = jnp.zeros((n_amb, n_amb), x0.dtype)
        cov_ok = jnp.asarray(False)

    intr, quats_f, trans_f = blocks.unpack_intr_quats_trans(out.x, pc, v)
    poses = blocks.quat_tran_to_poses(quats_f, trans_f)
    r = reproject_residuals(model, intr, quats_f, trans_f, obj_xy, img_uv, mask)
    cnt = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    view_errors = jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)) / (2.0 * cnt))
    return out, intr, poses, view_errors, cov, cov_ok


@dataclasses.dataclass
class IntrinsicsOptimizationResult:
    core: OptimResult
    camera: np.ndarray  # flat intrinsics (model packing)
    c_se3_t: np.ndarray  # (V, 4, 4)
    view_errors: np.ndarray


def optimize_intrinsics(
    obj_xy,
    img_uv,
    init_intr,
    init_c_se3_t,
    mask=None,
    model: CameraModelSpec = PINHOLE,
    opts: IntrinsicsOptimOptions | None = None,
    precision: str = "f64",
    view_valid=None,
    solver: str = "schur",
    analytic_jac: bool = False,
):
    """Host-facing wrapper (optimize_intrinsics, intrinsics.cpp:99-120).

    Requires >= 4 views (intrinsics.cpp:94-97).
    """
    opts = opts or IntrinsicsOptimOptions()
    obj_xy = jnp.asarray(obj_xy)
    if obj_xy.shape[0] < 4:
        raise ValueError("Insufficient views for calibration (at least 4 required).")
    out, intr, poses, view_errors, cov, cov_ok = optimize_intrinsics_device(
        obj_xy,
        jnp.asarray(img_uv),
        jnp.asarray(init_intr),
        jnp.asarray(init_c_se3_t),
        mask=mask,
        model=model,
        opts=opts,
        precision=precision,
        view_valid=view_valid,
        solver=solver,
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
    return IntrinsicsOptimizationResult(
        core=core,
        camera=np.asarray(intr),
        c_se3_t=np.asarray(poses),
        view_errors=np.asarray(view_errors),
    )
