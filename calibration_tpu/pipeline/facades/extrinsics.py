"""Stereo / multi-camera extrinsics facades (reference:
include/calib/pipeline/facades/extrinsics.h + src/pipeline/facades/extrinsics.cpp).

View matching by filename, >= 4 points each; DLT seed through normalized
coordinates (the reference converts to a DualDistortion camera purely to
call ``apply_intrinsics`` — a linear normalize — so we normalize with K
directly), then joint LM refinement.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ...models import camera_matrix as cm
from ...ops import extrinsics_linear
from ...optim import ExtrinsicOptions, ExtrinsicOptimizationResult, optimize_extrinsics
from ..dataset import PlanarDetections
from ..planar_utils import make_planar_arrays
from .intrinsics import IntrinsicCalibrationOutputs


@dataclasses.dataclass
class StereoViewSelection:
    """facades/extrinsics.h:18-21."""

    reference_image: str = ""
    target_image: str = ""


@dataclasses.dataclass
class StereoPairConfig:
    """facades/extrinsics.h:23-29."""

    pair_id: str = ""
    reference_sensor: str = ""
    target_sensor: str = ""
    views: List[StereoViewSelection] = dataclasses.field(default_factory=list)
    options: ExtrinsicOptions = dataclasses.field(default_factory=ExtrinsicOptions)


@dataclasses.dataclass
class StereoCalibrationConfig:
    """facades/extrinsics.h:31-33."""

    pairs: List[StereoPairConfig] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class StereoCalibrationViewSummary:
    """facades/extrinsics.h:35-41."""

    reference_image: str = ""
    target_image: str = ""
    reference_points: int = 0
    target_points: int = 0
    status: str = ""


@dataclasses.dataclass
class ExtrinsicPosesOut:
    c_se3_r: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 4, 4)))
    r_se3_t: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 4, 4)))


@dataclasses.dataclass
class StereoCalibrationRunResult:
    """facades/extrinsics.h:43-50."""

    success: bool = False
    requested_views: int = 0
    used_views: int = 0
    view_summaries: List[StereoCalibrationViewSummary] = dataclasses.field(default_factory=list)
    initial_guess: ExtrinsicPosesOut = dataclasses.field(default_factory=ExtrinsicPosesOut)
    optimization: Optional[ExtrinsicOptimizationResult] = None


def _pack_multicam(views_raw: List[List[tuple]]) -> tuple:
    """ragged [view][cam] -> padded (V, C, N, 2) x2 + (V, C, N) mask."""
    v = len(views_raw)
    c = len(views_raw[0])
    n = max(max(o.shape[0] for o, _ in view) for view in views_raw)
    obj = np.zeros((v, c, n, 2))
    uv = np.zeros((v, c, n, 2))
    mask = np.zeros((v, c, n), bool)
    for vi, view in enumerate(views_raw):
        for ci, (o, u) in enumerate(view):
            k = o.shape[0]
            obj[vi, ci, :k] = o
            uv[vi, ci, :k] = u
            mask[vi, ci, :k] = True
    return obj, uv, mask


def _seed_and_optimize_extrinsics(obj, uv, mask, cameras, options: ExtrinsicOptions):
    """The ONE serial DLT-seed + joint-LM recipe (facades/extrinsics.cpp:
    120-133): normalize with K, estimate_extrinsic_dlt, optimize. Both the
    facade path and the fleet fallback delegate here so the seed recipe can
    never desynchronize between them (fleet._extrinsics_fleet_jit is the
    same recipe vmapped on-device, held equal by the fleet==serial tests).
    Returns ((init_c, init_r) numpy, optimization)."""
    import jax.numpy as jnp

    kmtxs = jnp.asarray(cameras)[:, :5]
    norm_uv = cm.normalize(kmtxs[None, :, None, :], jnp.asarray(uv))
    initial = extrinsics_linear.estimate_extrinsic_dlt(
        jnp.asarray(obj), norm_uv, jnp.asarray(mask)
    )
    optimization = optimize_extrinsics(
        obj, uv, cameras, initial.c_se3_r, initial.r_se3_t,
        mask=jnp.asarray(mask), opts=options,
    )
    return (np.asarray(initial.c_se3_r), np.asarray(initial.r_se3_t)), optimization


def _run_extrinsic_estimation(views_raw, cameras, options: ExtrinsicOptions):
    """DLT seed + joint LM (facades/extrinsics.cpp:120-133)."""
    obj, uv, mask = _pack_multicam(views_raw)
    (init_c, init_r), optimization = _seed_and_optimize_extrinsics(
        obj, uv, mask, cameras, options
    )
    return ExtrinsicPosesOut(init_c, init_r), optimization


def _collect_stereo_views(
    cfg: StereoPairConfig,
    reference_detections: PlanarDetections,
    target_detections: PlanarDetections,
    reference_intrinsics: IntrinsicCalibrationOutputs,
    target_intrinsics: IntrinsicCalibrationOutputs,
):
    """The ONE stereo host-side walk (facades/extrinsics.cpp:39-89): view
    matching by filename, per-view status summaries, >=4-point gating.
    Both ``calibrate`` and ``calibrate_many`` consume this, so status strings
    and gating can never drift between the serial and fleet paths.

    Returns (result-with-summaries, views_raw, cameras); cameras is None when
    no views survived."""
    result = StereoCalibrationRunResult(requested_views=len(cfg.views))
    if reference_intrinsics.refine_result is None or target_intrinsics.refine_result is None:
        raise RuntimeError("StereoCalibrationFacade: camera intrinsics are not available.")

    ref_lookup = {img.file: img for img in reference_detections.images}
    tgt_lookup = {img.file: img for img in target_detections.images}

    views_raw = []
    for sel in cfg.views:
        summary = StereoCalibrationViewSummary(sel.reference_image, sel.target_image)
        ref_img = ref_lookup.get(sel.reference_image)
        tgt_img = tgt_lookup.get(sel.target_image)
        if ref_img is None:
            summary.status = "missing_reference_image"
            result.view_summaries.append(summary)
            continue
        if tgt_img is None:
            summary.status = "missing_target_image"
            result.view_summaries.append(summary)
            continue
        ref_view = make_planar_arrays(ref_img)
        tgt_view = make_planar_arrays(tgt_img)
        summary.reference_points = ref_view[0].shape[0]
        summary.target_points = tgt_view[0].shape[0]
        if summary.reference_points < 4 or summary.target_points < 4:
            summary.status = "insufficient_points"
            result.view_summaries.append(summary)
            continue
        summary.status = "ok"
        result.view_summaries.append(summary)
        views_raw.append([ref_view, tgt_view])

    result.used_views = len(views_raw)
    if not views_raw:
        return result, views_raw, None
    cameras = np.stack(
        [reference_intrinsics.refine_result.camera, target_intrinsics.refine_result.camera]
    )
    return result, views_raw, cameras


def _fleet_calibrate_many(items, collect):
    """Shared fleet driver for both extrinsics facades: run the host walk
    (``collect``, returning (result, views_raw, cameras)) per item, pack the
    survivors into ExtrinsicsJobs, solve them in one batched dispatch per
    shape bucket, and splice the optimizations back in item order. Per-item
    exceptions are captured in the result list (stereo_stage.cpp:141-146
    per-pair isolation)."""
    from .. import fleet

    results: list = [None] * len(items)
    jobs, job_slots = [], []
    for i, item in enumerate(items):
        try:
            result, views_raw, cameras = collect(*item)
            results[i] = result
            if cameras is None:
                continue
            obj, uv, mask = _pack_multicam(views_raw)
            jobs.append(fleet.ExtrinsicsJob(
                obj=obj, uv=uv, mask=mask, cameras=cameras, opts=item[0].options
            ))
            job_slots.append(i)
        except Exception as ex:  # noqa: BLE001 — per-pair/per-rig isolation
            results[i] = ex

    try:
        solved = fleet.extrinsics_fleet(jobs) if jobs else []
    except Exception:  # pragma: no cover — shape/compile failure fallback
        solved = []
        for job in jobs:
            try:
                solved.append(_run_extrinsic_estimation_packed(job))
            except Exception as ex:  # noqa: BLE001
                solved.append(ex)

    for slot, item in zip(job_slots, solved):
        if isinstance(item, Exception):
            results[slot] = item
            continue
        (init_c, init_r), opt = item
        result = results[slot]
        result.initial_guess = ExtrinsicPosesOut(np.asarray(init_c), np.asarray(init_r))
        result.optimization = opt
        result.success = opt.core.success
    return results


class StereoCalibrationFacade:
    """facades/extrinsics.cpp:91-134."""

    def calibrate(
        self,
        cfg: StereoPairConfig,
        reference_detections: PlanarDetections,
        target_detections: PlanarDetections,
        reference_intrinsics: IntrinsicCalibrationOutputs,
        target_intrinsics: IntrinsicCalibrationOutputs,
    ) -> StereoCalibrationRunResult:
        result, views_raw, cameras = _collect_stereo_views(
            cfg, reference_detections, target_detections,
            reference_intrinsics, target_intrinsics,
        )
        if cameras is None:
            result.success = False
            return result
        result.initial_guess, result.optimization = _run_extrinsic_estimation(
            views_raw, cameras, cfg.options
        )
        result.success = result.optimization.core.success
        return result

    def calibrate_many(self, items) -> list:
        """Fleet variant of ``calibrate``: one batched DLT+LM dispatch per
        (V, C, N, options) shape bucket instead of one per pair (the
        reference loops pairs serially, stereo_stage.cpp:68-149).

        items: sequence of ``calibrate`` argument tuples
        (cfg, ref_det, tgt_det, ref_intr, tgt_intr). Returns one
        StereoCalibrationRunResult (or the raised Exception) per item, in
        order — same results as the serial path (vmap of the same device
        core; see tests/test_facades_stages.py fleet==serial tests)."""
        return _fleet_calibrate_many(items, _collect_stereo_views)


def _run_extrinsic_estimation_packed(job):
    """Serial fallback for one packed ExtrinsicsJob: same return shape as
    one extrinsics_fleet element ((init_c, init_r), optimization)."""
    return _seed_and_optimize_extrinsics(
        job.obj, job.uv, job.mask, job.cameras, job.opts
    )


@dataclasses.dataclass
class MultiCameraViewSelection:
    """facades/extrinsics.h:63-66."""

    images: Dict[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class MultiCameraRigConfig:
    """facades/extrinsics.h:68-73."""

    rig_id: str = ""
    sensors: List[str] = dataclasses.field(default_factory=list)
    views: List[MultiCameraViewSelection] = dataclasses.field(default_factory=list)
    options: ExtrinsicOptions = dataclasses.field(default_factory=ExtrinsicOptions)


@dataclasses.dataclass
class MultiCameraCalibrationRunResult:
    """facades/extrinsics.h:75-82."""

    success: bool = False
    requested_views: int = 0
    used_views: int = 0
    sensors: List[str] = dataclasses.field(default_factory=list)
    initial_guess: ExtrinsicPosesOut = dataclasses.field(default_factory=ExtrinsicPosesOut)
    optimization: Optional[ExtrinsicOptimizationResult] = None


def _collect_multicam_views(
    cfg: MultiCameraRigConfig,
    detections_by_sensor: Dict[str, PlanarDetections],
    intrinsics_by_sensor: Dict[str, IntrinsicCalibrationOutputs],
):
    """The ONE multicam host-side walk (facades/extrinsics.cpp:137-175):
    all-sensors-present view matching, >=4-point gating. Shared by
    ``calibrate`` and ``calibrate_many`` (see _collect_stereo_views).

    Returns (result, views_raw, cameras); cameras is None when no views
    survived."""
    result = MultiCameraCalibrationRunResult(
        requested_views=len(cfg.views), sensors=list(cfg.sensors)
    )
    for sid in cfg.sensors:
        intr = intrinsics_by_sensor.get(sid)
        if intr is None or intr.refine_result is None:
            raise RuntimeError(
                f"MultiCameraCalibrationFacade: intrinsics not available for sensor: {sid}"
            )

    lookup = {
        sid: {img.file: img for img in det.images}
        for sid, det in detections_by_sensor.items()
    }
    views_raw = []
    for sel in cfg.views:
        multi = []
        ok = True
        for sid in cfg.sensors:
            fname = sel.images.get(sid)
            img = lookup.get(sid, {}).get(fname) if fname else None
            if img is None:
                ok = False
                break
            view = make_planar_arrays(img)
            if view[0].shape[0] < 4:
                ok = False
                break
            multi.append(view)
        if ok:
            views_raw.append(multi)

    result.used_views = len(views_raw)
    if not views_raw:
        return result, views_raw, None
    cameras = np.stack(
        [intrinsics_by_sensor[sid].refine_result.camera for sid in cfg.sensors]
    )
    return result, views_raw, cameras


class MultiCameraCalibrationFacade:
    """facades/extrinsics.cpp:137-229."""

    def calibrate(
        self,
        cfg: MultiCameraRigConfig,
        detections_by_sensor: Dict[str, PlanarDetections],
        intrinsics_by_sensor: Dict[str, IntrinsicCalibrationOutputs],
    ) -> MultiCameraCalibrationRunResult:
        result, views_raw, cameras = _collect_multicam_views(
            cfg, detections_by_sensor, intrinsics_by_sensor
        )
        if cameras is None:
            result.success = False
            return result
        result.initial_guess, result.optimization = _run_extrinsic_estimation(
            views_raw, cameras, cfg.options
        )
        result.success = result.optimization.core.success
        return result

    def calibrate_many(self, items) -> list:
        """Fleet variant of ``calibrate``: one batched DLT+LM dispatch per
        (V, C, N, options) shape bucket instead of one per rig (same
        redesign as StereoCalibrationFacade.calibrate_many — the reference
        loops rigs serially through the facade).

        items: sequence of ``calibrate`` argument tuples
        (cfg, detections_by_sensor, intrinsics_by_sensor). Returns one
        MultiCameraCalibrationRunResult (or the raised Exception) per item,
        in order."""
        return _fleet_calibrate_many(items, _collect_multicam_views)
