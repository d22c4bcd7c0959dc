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
