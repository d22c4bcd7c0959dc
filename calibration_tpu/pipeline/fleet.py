"""Fleet dispatch for the hand-eye and bundle pipeline stages.

The reference runs every rig/sensor serially (handeye_stage.cpp:71-209,
bundle_stage.cpp:8-169) — each per-view planar pose, hand-eye solve and
bundle adjustment is its own call. On this attachment every device dispatch
pays remote-execution latency that dwarfs the tiny solves, so a 16-rig
pipeline spends its wall time on ~200 round trips. These helpers gather a
whole stage's numerical work into a handful of batched programs (the same
redesign IntrinsicStage uses via ``facade.calibrate_many``): jobs are
bucketed by static shape + static options, each bucket runs as ONE vmapped
jit, and results return in submission order.

The batched programs are vmaps of exactly the functions the serial path
calls, so results are bit-identical (tests/test_facades_stages.py
``test_handeye_bundle_fleet_matches_serial``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import handeye_linear as hel
from ..ops import planarpose, se3
from ..optim.core import OptimOptions
from ..optim.handeye import (
    OPTIMIZE_MIN_ANGLE_DEG,
    HandeyeResult,
    _wrap_result,
    optimize_handeye_device,
)


@functools.partial(jax.jit, static_argnames=())
def _planar_pose_linear_jit(obj, uv, kmtx, mask):
    return jax.vmap(planarpose.estimate_planar_pose)(obj, uv, kmtx, mask)


def planar_pose_fleet(jobs: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]]) -> List[np.ndarray]:
    """Linear planar poses for many views in few dispatches.

    jobs: sequence of (obj (N, 2), uv (N, 2), kmtx (5,)) with possibly
    different N. Buckets by exact N (masked padding would also be exact, but
    detections from one dataset share shapes in practice). Returns (4, 4)
    poses in job order.
    """
    buckets: Dict[int, List[int]] = {}
    for idx, (obj, _, _) in enumerate(jobs):
        buckets.setdefault(obj.shape[0], []).append(idx)

    out: List[np.ndarray] = [None] * len(jobs)  # type: ignore[list-item]
    for _, idxs in sorted(buckets.items()):
        obj = jnp.asarray(np.stack([jobs[i][0] for i in idxs]))
        uv = jnp.asarray(np.stack([jobs[i][1] for i in idxs]))
        kmtx = jnp.asarray(np.stack([jobs[i][2] for i in idxs]))
        mask = jnp.ones(obj.shape[:-1], bool)
        poses = np.asarray(_planar_pose_linear_jit(obj, uv, kmtx, mask))
        for j, i in enumerate(idxs):
            out[i] = poses[j]
    return out


@functools.partial(jax.jit, static_argnames=("min_angle_deg", "options"))
def _handeye_fleet_jit(bg, ct, min_angle_deg, options):
    def solve(bg1, ct1):
        # exactly estimate_and_optimize_handeye (optim/handeye.py): DLT seed
        # at the rig's min angle, LM on the SAME pairs reweighted at 0.5 deg
        pairs = hel.build_all_pairs(bg1, ct1, min_angle_deg)
        init, _ = hel.estimate_handeye_dlt_pairs(pairs)
        return optimize_handeye_device(
            hel.reweight(pairs, OPTIMIZE_MIN_ANGLE_DEG), init, options
        )

    return jax.vmap(solve)(bg, ct)


def handeye_fleet(
    jobs: Sequence[Tuple[np.ndarray, np.ndarray, float, OptimOptions]],
) -> List[HandeyeResult]:
    """Batched estimate_and_optimize_handeye.

    jobs: sequence of (base_se3_gripper (P, 4, 4), cam_se3_target (P, 4, 4),
    min_angle_deg, options); bucketed by (P, min_angle_deg, options).
    Returns HandeyeResult per job, in order.
    """
    buckets: Dict[tuple, List[int]] = {}
    for idx, (bg, _, ang, opts) in enumerate(jobs):
        buckets.setdefault((bg.shape[0], float(ang), opts), []).append(idx)

    out: List[HandeyeResult] = [None] * len(jobs)  # type: ignore[list-item]
    for (_, ang, opts), idxs in buckets.items():
        bg = jnp.asarray(np.stack([jobs[i][0] for i in idxs]))
        ct = jnp.asarray(np.stack([jobs[i][1] for i in idxs]))
        # ONE device->host transfer for the whole bucket: per-job sliced
        # conversions each paid a remote round trip (measured 3.7s of a
        # 3.8s 16-rig call; the dispatch itself is 64ms)
        lm_out, pose, cov, cov_ok = jax.device_get(
            _handeye_fleet_jit(bg, ct, ang, opts)
        )
        for j, i in enumerate(idxs):
            out[i] = _wrap_result(
                jax.tree_util.tree_map(lambda a, j=j: a[j], lm_out),
                pose[j], cov[j], cov_ok[j], opts,
            )
    return out


@functools.partial(jax.jit, static_argnames=("min_angle_deg", "options"))
def _planar_handeye_fused_jit(obj, uv, mask, kmtx, bg, min_angle_deg, options):
    """Per-view planar poses + AX=XB DLT seed + LM refine in ONE program.

    obj/uv: (R, O, N, 2); mask: (R, O, N); kmtx: (R, 5); bg: (R, O, 4, 4).
    The intermediate camera->target poses never leave the device — on this
    attachment the separate planar-pose dispatch paid its own ~30ms H2D +
    ~30ms D2H round trip just to feed the hand-eye dispatch's H2D.
    """
    r, o = obj.shape[0], obj.shape[1]
    kmtx_b = jnp.broadcast_to(kmtx[:, None, :], (r, o, 5))
    ct = planarpose.estimate_planar_pose(obj, uv, kmtx_b, mask)

    def solve(bg1, ct1):
        # exactly estimate_and_optimize_handeye (see _handeye_fleet_jit)
        pairs = hel.build_all_pairs(bg1, ct1, min_angle_deg)
        init, _ = hel.estimate_handeye_dlt_pairs(pairs)
        return optimize_handeye_device(
            hel.reweight(pairs, OPTIMIZE_MIN_ANGLE_DEG), init, options
        )

    return jax.vmap(solve)(bg, ct)


def planar_handeye_fleet(
    jobs: Sequence[Tuple[List[np.ndarray], List[np.ndarray], np.ndarray, np.ndarray, float, OptimOptions]],
) -> List[HandeyeResult]:
    """Fused planar-pose + estimate_and_optimize_handeye fleet.

    jobs: sequence of (obj_list [O x (N_i, 2)], uv_list, kmtx (5,),
    base_se3_gripper (O, 4, 4), min_angle_deg, options). Views are padded to
    the bucket's max point count with masks (masked rows are zeroed, exactly
    equivalent to dropping them in the pose least squares). Bucketed by
    (O, padded N, min_angle_deg, options). Returns HandeyeResult per job,
    in order — identical to planar_pose_fleet + handeye_fleet (same device
    functions, one program)."""
    buckets: Dict[tuple, List[int]] = {}
    for idx, (objs, _, _, bg, ang, opts) in enumerate(jobs):
        nmax = max(o.shape[0] for o in objs)
        buckets.setdefault((len(objs), nmax, float(ang), opts), []).append(idx)

    out: List[HandeyeResult] = [None] * len(jobs)  # type: ignore[list-item]
    for (o_count, nmax, ang, opts), idxs in buckets.items():
        r = len(idxs)
        obj = np.zeros((r, o_count, nmax, 2))
        uv = np.zeros((r, o_count, nmax, 2))
        mask = np.zeros((r, o_count, nmax), bool)
        kmtx = np.stack([jobs[i][2] for i in idxs])
        bg = np.stack([jobs[i][3] for i in idxs])
        for j, i in enumerate(idxs):
            for k, (ob, im) in enumerate(zip(jobs[i][0], jobs[i][1])):
                n = ob.shape[0]
                obj[j, k, :n] = ob
                uv[j, k, :n] = im
                mask[j, k, :n] = True
        lm_out, pose, cov, cov_ok = jax.device_get(
            _planar_handeye_fused_jit(
                jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(mask),
                jnp.asarray(kmtx), jnp.asarray(bg), ang, opts,
            )
        )
        for j, i in enumerate(idxs):
            out[i] = _wrap_result(
                jax.tree_util.tree_map(lambda a, j=j: a[j], lm_out),
                pose[j], cov[j], cov_ok[j], opts,
            )
    return out


@functools.partial(jax.jit, static_argnames=("min_angle_deg",))
def _handeye_dlt_fleet_jit(bg, ct, min_angle_deg):
    fn = lambda b, c: hel.estimate_handeye_dlt(b, c, min_angle_deg)
    return jax.vmap(fn)(bg, ct)


def handeye_dlt_fleet(
    jobs: Sequence[Tuple[np.ndarray, np.ndarray, float]],
) -> List[Tuple[np.ndarray, bool]]:
    """Batched Tsai-Lenz DLT seeds (no LM): the bundle stage's hand-eye
    initialization fallback when no prior hand-eye result exists
    (bundle_utils.cpp:148-200 runs estimate_handeye_dlt per rig x sensor).
    jobs: (base_se3_gripper (P, 4, 4), cam_se3_target (P, 4, 4),
    min_angle_deg); bucketed by (P, min_angle_deg). Returns (pose (4, 4)
    numpy, ok bool) per job, in order."""
    buckets: Dict[tuple, List[int]] = {}
    for idx, (bg, _, ang) in enumerate(jobs):
        buckets.setdefault((bg.shape[0], float(ang)), []).append(idx)

    out: List = [None] * len(jobs)
    for (_, ang), idxs in buckets.items():
        bg = jnp.asarray(np.stack([jobs[i][0] for i in idxs]))
        ct = jnp.asarray(np.stack([jobs[i][1] for i in idxs]))
        poses, oks = jax.device_get(_handeye_dlt_fleet_jit(bg, ct, ang))
        for j, i in enumerate(idxs):
            out[i] = (poses[j], bool(oks[j]))
    return out


@functools.partial(jax.jit, static_argnames=("kmax",))
def _average_isometries_padded_jit(poses, mask, kmax):
    del kmax  # static shape key only
    return jax.vmap(se3.average_isometries)(poses, mask)


def average_isometries_fleet(groups: Sequence[Sequence[np.ndarray]]) -> List[np.ndarray]:
    """Masked-padded batched quaternion pose averaging: one dispatch for all
    rigs' target-pose initializations instead of one per rig
    (bundle_utils.cpp:202-237 runs this per rig)."""
    if not groups:
        return []
    kmax = max(len(g) for g in groups)
    poses = np.tile(np.eye(4), (len(groups), kmax, 1, 1))
    mask = np.zeros((len(groups), kmax))
    for i, g in enumerate(groups):
        for k, p in enumerate(g):
            poses[i, k] = p
            mask[i, k] = 1.0
    avg = np.asarray(
        _average_isometries_padded_jit(jnp.asarray(poses), jnp.asarray(mask), kmax)
    )
    return [avg[i] for i in range(len(groups))]


@functools.partial(jax.jit, static_argnames=("opts",))
def _extrinsics_fleet_jit(obj, uv, mask, cams, opts):
    from ..models import camera_matrix as cm
    from ..ops import extrinsics_linear
    from ..optim.extrinsics import optimize_extrinsics_device

    def solve(o, u, m, c):
        # exactly facades/extrinsics._run_extrinsic_estimation: normalize
        # with K, multicam DLT seed, joint LM refine
        norm_uv = cm.normalize(c[None, :, None, :5], u)
        init = extrinsics_linear.estimate_extrinsic_dlt(o, norm_uv, m)
        out = optimize_extrinsics_device(
            o, u, c, init.c_se3_r, init.r_se3_t, mask=m.astype(o.dtype), opts=opts
        )
        return init, out

    return jax.vmap(solve)(obj, uv, mask, cams)


@dataclasses.dataclass(frozen=True)
class ExtrinsicsJob:
    """One rig/pair's extrinsics problem (the _run_extrinsic_estimation
    argument set: stereo pairs are the C=2 case)."""

    obj: np.ndarray  # (V, C, N, 2)
    uv: np.ndarray  # (V, C, N, 2)
    mask: np.ndarray  # (V, C, N) bool
    cameras: np.ndarray  # (C, pc)
    opts: object  # ExtrinsicOptions (frozen dataclass)


def extrinsics_fleet(jobs: Sequence[ExtrinsicsJob]):
    """Batched DLT-seed + joint-LM extrinsics: one vmapped dispatch per
    (V, C, N, pc, opts) bucket (the reference's stereo stage solves pairs
    serially, stereo_stage.cpp:68-149). Returns per job, in order:
    (initial ExtrinsicPoses (numpy fields), ExtrinsicOptimizationResult) —
    identical to the serial facade path (same device core under vmap)."""
    from ..optim.core import OptimResult, TerminationType, brief_report
    from ..optim.extrinsics import ExtrinsicOptimizationResult

    buckets: Dict[tuple, List[int]] = {}
    for idx, job in enumerate(jobs):
        buckets.setdefault((job.obj.shape, job.cameras.shape, job.opts), []).append(idx)

    out: List = [None] * len(jobs)
    for (_, _, opts), idxs in buckets.items():
        stack = lambda field: jnp.asarray(
            np.stack([np.asarray(getattr(jobs[i], field)) for i in idxs])
        )
        init, lm = jax.device_get(
            _extrinsics_fleet_jit(
                stack("obj"), stack("uv"),
                jnp.asarray(np.stack([jobs[i].mask for i in idxs])),
                stack("cameras"), opts,
            )
        )  # one transfer per bucket — per-job slices are then host-side
        lm_out, intr, c_se3_r, r_se3_t, cov, cov_ok = lm
        for j, i in enumerate(idxs):
            core = OptimResult(
                success=bool(lm_out.success[j]),
                covariance=(
                    np.asarray(cov[j])
                    if (opts.core.compute_covariance and bool(cov_ok[j]))
                    else None
                ),
                final_cost=float(lm_out.cost[j]),
                iterations=int(lm_out.iterations[j]),
                termination=TerminationType(int(lm_out.termination[j])),
                initial_cost=float(lm_out.initial_cost[j]),
            )
            core.report = brief_report(core)
            opt = ExtrinsicOptimizationResult(
                core=core,
                cameras=np.asarray(intr[j]),
                c_se3_r=np.asarray(c_se3_r[j]),
                r_se3_t=np.asarray(r_se3_t[j]),
            )
            out[i] = (
                (np.asarray(init.c_se3_r[j]), np.asarray(init.r_se3_t[j])),
                opt,
            )
    return out


@dataclasses.dataclass(frozen=True)
class BundleJob:
    """One rig's bundle problem (the optimize_bundle argument set)."""

    obj: np.ndarray  # (O, N, 2)
    uv: np.ndarray  # (O, N, 2)
    bg: np.ndarray  # (O, 4, 4)
    cam_idx: np.ndarray  # (O,)
    cameras: np.ndarray  # (C, pc)
    he_init: np.ndarray  # (C, 4, 4)
    target: np.ndarray  # (4, 4)
    mask: np.ndarray  # (O, N)
    opts: object  # BundleOptions (frozen dataclass)


@functools.lru_cache(maxsize=None)
def _bundle_fleet_jit():
    """Process-lifetime jit for the bundle fleet (deferred import breaks the
    optim<->pipeline cycle). A fresh jax.jit per bundle_fleet call retraced
    the full vmapped bundle LM graph on EVERY pipeline run — measured 15s of
    a 26s warm 16-rig pipeline execute on the TPU attachment."""
    from ..optim.bundle import optimize_bundle_device

    @functools.partial(jax.jit, static_argnames=("opts",))
    def fleet_jit(obj, uv, bg, ci, cams, g0, b0, mask, opts):
        fn = lambda o, u, b, c, k, g, t, m: optimize_bundle_device(
            o, u, b, c, k, g, t, mask=m, opts=opts
        )
        return jax.vmap(fn)(obj, uv, bg, ci, cams, g0, b0, mask)

    return fleet_jit


@dataclasses.dataclass(frozen=True)
class FusedBundleJob:
    """One rig's full bundle-stage device work when every hand-eye init is
    host-known (source 'handeye' or 'identity' — no DLT seed needed): planar
    poses, averaged-target init and the bundle LM run as ONE program."""

    obj: np.ndarray  # (O, N, 2)
    uv: np.ndarray  # (O, N, 2)
    mask: np.ndarray  # (O, N)
    kmtx: np.ndarray  # (O, 5) — per-observation camera K rows
    bg: np.ndarray  # (O, 4, 4)
    cam_idx: np.ndarray  # (O,)
    cameras: np.ndarray  # (C, pc)
    he_init: np.ndarray  # (C, 4, 4)
    target_given: np.ndarray  # (4, 4) — used when use_given_target
    use_given_target: bool
    opts: object  # BundleOptions (frozen dataclass)


@functools.lru_cache(maxsize=None)
def _bundle_fused_jit():
    from ..optim.bundle import optimize_bundle_device

    @functools.partial(jax.jit, static_argnames=("opts",))
    def fused(obj, uv, mask, kmtx, bg, ci, cams, g0, tgt_given, use_given, opts):
        # 1) per-observation planar poses (bundle_utils.cpp:60-145's
        #    estimate_planar_pose calls, batched)
        ct = planarpose.estimate_planar_pose(obj, uv, kmtx, mask > 0)
        # 2) averaged-target init b*X*c (bundle_utils.cpp:202-237), candidates
        #    in the serial path's sensor-major order (stable sort by cam_idx)
        #    so quaternion sign alignment matches the staged path exactly
        order = jnp.argsort(ci, axis=-1, stable=True)
        x_per_obs = jnp.take_along_axis(g0, ci[..., None, None], axis=1)
        cand = bg @ x_per_obs @ ct
        cand = jnp.take_along_axis(cand, order[..., None, None], axis=1)
        avg = jax.vmap(se3.average_isometries)(
            cand, jnp.ones(cand.shape[:2], cand.dtype)
        )
        tgt0 = jnp.where(use_given[:, None, None], tgt_given, avg)
        # 3) bundle LM
        fn = lambda o, u, b, c, k, g, t, m: optimize_bundle_device(
            o, u, b, c, k, g, t, mask=m, opts=opts
        )
        out = jax.vmap(fn)(obj, uv, bg, ci, cams, g0, tgt0, mask)
        return out, tgt0

    return fused


def bundle_fused_fleet(jobs: Sequence[FusedBundleJob]):
    """Fused bundle-stage fleet: one program per (O, N, C, pc, opts) bucket
    covering planar poses + target averaging + bundle LM (the staged path
    pays three dispatch round trips). Returns (BundleResult, target_init
    (4, 4) numpy) per job, in order."""
    from ..optim.bundle import BundleResult
    from ..optim.core import OptimResult, TerminationType, brief_report

    fused = _bundle_fused_jit()
    buckets: Dict[tuple, List[int]] = {}
    for idx, job in enumerate(jobs):
        buckets.setdefault((job.obj.shape, job.cameras.shape, job.opts), []).append(idx)

    out: List = [None] * len(jobs)
    for (_, _, opts), idxs in buckets.items():
        stack = lambda field: jnp.asarray(
            np.stack([np.asarray(getattr(jobs[i], field)) for i in idxs])
        )
        (lm_out, intr, g_se3_c, b_se3_t, cov, cov_ok), tgt0 = jax.device_get(
            fused(
                stack("obj"), stack("uv"), stack("mask"), stack("kmtx"),
                stack("bg"),
                jnp.asarray(
                    np.stack([np.asarray(jobs[i].cam_idx) for i in idxs]), jnp.int32
                ),
                stack("cameras"), stack("he_init"), stack("target_given"),
                jnp.asarray([bool(jobs[i].use_given_target) for i in idxs]),
                opts,
            )
        )  # one transfer per bucket
        for j, i in enumerate(idxs):
            core = OptimResult(
                success=bool(lm_out.success[j]),
                covariance=(
                    np.asarray(cov[j])
                    if (opts.core.compute_covariance and bool(cov_ok[j]))
                    else None
                ),
                final_cost=float(lm_out.cost[j]),
                iterations=int(lm_out.iterations[j]),
                termination=TerminationType(int(lm_out.termination[j])),
                initial_cost=float(lm_out.initial_cost[j]),
            )
            core.report = brief_report(core)
            out[i] = (
                BundleResult(
                    core=core,
                    cameras=np.asarray(intr[j]),
                    g_se3_c=np.asarray(g_se3_c[j]),
                    b_se3_t=np.asarray(b_se3_t[j]),
                ),
                np.asarray(tgt0[j]),
            )
    return out


def bundle_fleet(jobs: Sequence[BundleJob]):
    """Batched optimize_bundle: one vmapped dispatch per
    (O, N, C, pc, opts) bucket. Returns BundleResult per job, in order —
    identical to serial optimize_bundle (same device core under vmap)."""
    from ..optim.bundle import BundleResult
    from ..optim.core import OptimResult, TerminationType, brief_report

    fleet_jit = _bundle_fleet_jit()

    buckets: Dict[tuple, List[int]] = {}
    for idx, job in enumerate(jobs):
        key = (job.obj.shape, job.cameras.shape, job.opts)
        buckets.setdefault(key, []).append(idx)

    out: List = [None] * len(jobs)
    for (_, _, opts), idxs in buckets.items():
        stack = lambda field: jnp.asarray(
            np.stack([np.asarray(getattr(jobs[i], field)) for i in idxs])
        )
        lm_out, intr, g_se3_c, b_se3_t, cov, cov_ok = jax.device_get(
            fleet_jit(
                stack("obj"), stack("uv"), stack("bg"),
                jnp.asarray(
                    np.stack([np.asarray(jobs[i].cam_idx) for i in idxs]), jnp.int32
                ),
                stack("cameras"), stack("he_init"), stack("target"), stack("mask"),
                opts,
            )
        )  # one transfer per bucket — per-job slices are then host-side
        for j, i in enumerate(idxs):
            core = OptimResult(
                success=bool(lm_out.success[j]),
                covariance=(
                    np.asarray(cov[j])
                    if (opts.core.compute_covariance and bool(cov_ok[j]))
                    else None
                ),
                final_cost=float(lm_out.cost[j]),
                iterations=int(lm_out.iterations[j]),
                termination=TerminationType(int(lm_out.termination[j])),
                initial_cost=float(lm_out.initial_cost[j]),
            )
            core.report = brief_report(core)
            out[i] = BundleResult(
                core=core,
                cameras=np.asarray(intr[j]),
                g_se3_c=np.asarray(g_se3_c[j]),
                b_se3_t=np.asarray(b_se3_t[j]),
            )
    return out
