"""Pipeline stages (reference: include/calib/pipeline/stages.h +
src/pipeline/stages/{intrinsic,stereo,handeye,bundle}_stage.cpp).

Status strings, summary structure, artifact layout and the
ok/partial_success/failed aggregation rules mirror the reference so report
consumers see the same JSON.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..io import jsonio
from ..ops import handeye_linear
from ..optim import estimate_and_optimize_handeye, optimize_bundle
from . import fleet
from .facades.extrinsics import StereoCalibrationFacade
from .facades.intrinsics import PlanarIntrinsicCalibrationFacade
from .pipeline import CalibrationStage, PipelineContext, PipelineStageResult
from .planar_utils import (
    build_sensor_index,
    find_camera_config,
    find_handeye_rig,
    make_planar_arrays,
    pad_views,
)
from .reports import build_camera_report


def _pose_json(m) -> list:
    return np.asarray(m).tolist()


class IntrinsicStage(CalibrationStage):
    """stages.h:7-11 + intrinsic_stage.cpp."""

    def name(self) -> str:
        return "intrinsics"

    def run(self, context: PipelineContext) -> PipelineStageResult:
        result = PipelineStageResult(name=self.name())
        if not context.has_intrinsics_config():
            result.summary["error"] = "No intrinsics configuration supplied."
            return result
        if not context.dataset.planar_cameras:
            result.summary["error"] = "Dataset does not contain planar camera captures."
            return result

        cfg = context.intrinsics_config()
        facade = PlanarIntrinsicCalibrationFacade()
        overall = True
        cameras = []
        # fleet dispatch: sensors sharing a (view, point) bucket solve in one
        # vmapped device program (reference loops the facade per camera,
        # intrinsic_stage.cpp:33-50)
        jobs, job_rows = [], []
        for detections in context.dataset.planar_cameras:
            sensor_id = detections.sensor_id or "cam0"
            cam_cfg = find_camera_config(cfg, sensor_id)
            row = {"sensor_id": sensor_id}
            cameras.append(row)
            if cam_cfg is None:
                row["status"] = "missing_camera_config"
                overall = False
                continue
            jobs.append((cam_cfg, detections))
            job_rows.append(row)

        for row, (cam_cfg, detections), run in zip(
            job_rows, jobs, facade.calibrate_many(cfg, jobs) if jobs else []
        ):
            sensor_id = row["sensor_id"]
            if isinstance(run, Exception):
                # parity (intrinsic_stage.cpp:46-49)
                row.update(status="calibration_failed", error=str(run))
                overall = False
                continue
            context.intrinsic_results[sensor_id] = run
            entry = build_camera_report(cam_cfg, detections, run)
            entry["sensor_id"] = sensor_id
            entry["tags"] = sorted(detections.tags)
            row.update(entry)

        has_synth = any("synthetic" in d.tags for d in context.dataset.planar_cameras)
        has_recorded = any("recorded" in d.tags for d in context.dataset.planar_cameras)
        result.summary["cameras"] = cameras
        result.summary["gating"] = {"synthetic": has_synth, "recorded": has_recorded}
        result.success = overall and bool(context.intrinsic_results)
        return result


class StereoCalibrationStage(CalibrationStage):
    """stereo_stage.cpp:25-164."""

    def name(self) -> str:
        return "stereo"

    def run(self, context: PipelineContext) -> PipelineStageResult:
        result = PipelineStageResult(name=self.name())
        result.summary["input_cameras"] = len(context.intrinsic_results)
        if not context.has_stereo_config():
            result.summary["status"] = "missing_config"
            return result
        if len(context.intrinsic_results) < 2:
            result.summary["status"] = "waiting_for_multiple_intrinsic_results"
            return result

        cfg = context.stereo_config()
        result.summary["requested_pairs"] = len(cfg.pairs)
        if not cfg.pairs:
            result.summary["status"] = "no_pairs_configured"
            return result

        detections_by_sensor = {
            d.sensor_id: d for d in context.dataset.planar_cameras if d.sensor_id
        }
        stereo_artifacts = context.artifacts.setdefault("stereo", {})
        stereo_artifacts["pairs"] = {}
        context.stereo_results.clear()

        facade = StereoCalibrationFacade()
        pairs_summary = []
        all_success, any_success = True, False

        # ---- phase A: per-pair config/lookup checks; defer device work ----
        items, item_pjs = [], []
        for pair_cfg in cfg.pairs:
            pj = {
                "pair_id": pair_cfg.pair_id,
                "reference_sensor": pair_cfg.reference_sensor,
                "target_sensor": pair_cfg.target_sensor,
                "requested_views": len(pair_cfg.views),
            }
            ref_intr = context.intrinsic_results.get(pair_cfg.reference_sensor)
            tgt_intr = context.intrinsic_results.get(pair_cfg.target_sensor)
            if ref_intr is None or tgt_intr is None:
                missing = [
                    s
                    for s, r in [
                        (pair_cfg.reference_sensor, ref_intr),
                        (pair_cfg.target_sensor, tgt_intr),
                    ]
                    if r is None
                ]
                pj.update(status="missing_intrinsics", missing=missing, success=False)
                all_success = False
                pairs_summary.append(pj)
                continue
            ref_det = detections_by_sensor.get(pair_cfg.reference_sensor)
            tgt_det = detections_by_sensor.get(pair_cfg.target_sensor)
            if ref_det is None or tgt_det is None:
                missing = [
                    s
                    for s, r in [
                        (pair_cfg.reference_sensor, ref_det),
                        (pair_cfg.target_sensor, tgt_det),
                    ]
                    if r is None
                ]
                pj.update(status="missing_detections", missing=missing, success=False)
                all_success = False
                pairs_summary.append(pj)
                continue

            items.append((pair_cfg, ref_det, tgt_det, ref_intr, tgt_intr))
            item_pjs.append(pj)
            pairs_summary.append(pj)

        # ---- phase B: one batched DLT+LM dispatch per shape bucket ----
        # (the reference solves pairs serially, stereo_stage.cpp:68-149)
        solved = facade.calibrate_many(items) if items else []

        # ---- phase C: fill reports in pair order ----
        for (pair_cfg, *_), pj, pr in zip(items, item_pjs, solved):
            if isinstance(pr, Exception):
                # parity (stereo_stage.cpp:141-146)
                pj.update(status="calibration_error", error=str(pr), success=False)
                all_success = False
                continue
            pj["views"] = [jsonio.to_jsonable(v) for v in pr.view_summaries]
            pj["used_views"] = pr.used_views
            pj["success"] = pr.success
            pj["status"] = "ok" if pr.success else "failed"
            if pr.optimization is not None:
                pj["final_cost"] = pr.optimization.core.final_cost
            if pr.success:
                any_success = True
                context.stereo_results[pair_cfg.pair_id] = pr.optimization
            else:
                all_success = False
            artifact = {
                "initial_guess": {
                    "c_se3_r": [_pose_json(m) for m in pr.initial_guess.c_se3_r],
                    "r_se3_t": [_pose_json(m) for m in pr.initial_guess.r_se3_t],
                },
                "views": pj.get("views", []),
            }
            if pr.optimization is not None:
                artifact["optimization"] = {
                    "success": pr.optimization.core.success,
                    "final_cost": pr.optimization.core.final_cost,
                    "report": pr.optimization.core.report,
                    "cameras": [c.tolist() for c in pr.optimization.cameras],
                    "c_se3_r": [_pose_json(m) for m in pr.optimization.c_se3_r],
                    "r_se3_t": [_pose_json(m) for m in pr.optimization.r_se3_t],
                }
                artifact["final_cost"] = pr.optimization.core.final_cost
            stereo_artifacts["pairs"][pair_cfg.pair_id] = artifact

        result.summary["pairs"] = pairs_summary
        result.summary["status"], result.success = _aggregate(any_success, all_success)
        return result


def _aggregate(any_success: bool, all_success: bool):
    if any_success and all_success:
        return "ok", True
    if any_success:
        return "partial_success", False
    return "failed", False


class HandEyeCalibrationStage(CalibrationStage):
    """handeye_stage.cpp:34-224.

    Fleet dispatch: the reference solves per rig x sensor serially (and one
    planar pose per view); here all views' poses and all sensors' AX=XB
    solves run as a handful of batched programs (pipeline.fleet), with
    identical per-sensor results and status semantics.
    """

    def name(self) -> str:
        return "hand_eye"

    def run(self, context: PipelineContext) -> PipelineStageResult:
        result = PipelineStageResult(name=self.name())
        if not context.intrinsic_results:
            result.summary["status"] = "waiting_for_intrinsic_stage"
            return result
        if not context.has_handeye_config():
            result.summary["status"] = "missing_config"
            return result
        cfg = context.handeye_config()
        if not cfg.rigs:
            result.summary["status"] = "no_rigs_configured"
            return result

        sensor_index = build_sensor_index(context.dataset.planar_cameras)
        context.handeye_results.clear()
        he_artifacts = context.artifacts.setdefault("hand_eye", {})

        # ---- phase A: walk rigs/sensors/views, defer the device work ----
        pose_jobs: List[tuple] = []  # (obj, uv, kmtx)
        records = []  # one per (rig, sensor) that reaches the solve gate
        rigs = []  # (rig, rig_json, sensors_artifact, sensors_json)
        for rig in cfg.rigs:
            rig_json = {
                "rig_id": rig.rig_id,
                "sensor_count": len(rig.sensors),
                "min_angle_deg": rig.min_angle_deg,
            }
            rig_artifact = he_artifacts.setdefault(rig.rig_id, {})
            rig_artifact["min_angle_deg"] = rig.min_angle_deg
            rig_artifact["options"] = jsonio.to_jsonable(rig.options)
            sensors_artifact = rig_artifact.setdefault("sensors", {})
            sensors_json: List[dict] = []
            rigs.append((rig, rig_json, sensors_artifact, sensors_json))

            for sensor_id in rig.sensors:
                sj = {
                    "sensor_id": sensor_id,
                    "requested_observations": len(rig.observations),
                    "min_angle_deg": rig.min_angle_deg,
                }
                rec = {
                    "rig": rig, "sensor_id": sensor_id, "sj": sj,
                    "sensors_json": sensors_json,
                    "sensors_artifact": sensors_artifact,
                    "bases": [], "pose_idx": [], "solve": None,
                    "views_obj": [], "views_uv": [], "kmtx": None,
                }
                records.append(rec)
                intr = context.intrinsic_results.get(sensor_id)
                if intr is None:
                    sj["status"] = "missing_intrinsics"
                    continue
                det_index = sensor_index.get(sensor_id)
                if det_index is None:
                    sj["status"] = "missing_detections"
                    continue

                camera = intr.refine_result.camera
                view_reports = []
                for view_cfg in rig.observations:
                    vj = {}
                    if view_cfg.view_id:
                        vj["id"] = view_cfg.view_id
                    vj["base_pose"] = _pose_json(view_cfg.base_se3_gripper)
                    fname = view_cfg.images.get(sensor_id)
                    if fname is None:
                        vj["status"] = "missing_image_reference"
                        view_reports.append(vj)
                        continue
                    img = det_index.image_lookup.get(fname)
                    if img is None:
                        vj["status"] = "image_not_in_dataset"
                        view_reports.append(vj)
                        continue
                    obj, uv = make_planar_arrays(img)
                    vj["points"] = obj.shape[0]
                    if obj.shape[0] < 4:
                        vj["status"] = "insufficient_points"
                        view_reports.append(vj)
                        continue
                    rec["bases"].append(np.asarray(view_cfg.base_se3_gripper))
                    rec["pose_idx"].append(len(pose_jobs))
                    rec["views_obj"].append(obj)
                    rec["views_uv"].append(uv)
                    rec["kmtx"] = np.asarray(camera[:5])
                    pose_jobs.append((obj, uv, np.asarray(camera[:5])))
                    vj["status"] = "ok"
                    view_reports.append(vj)

                sj["used_observations"] = len(rec["pose_idx"])
                sj["views"] = view_reports
                if len(rec["pose_idx"]) < 2:
                    sj["status"] = (
                        "no_observations" if not rec["pose_idx"] else "insufficient_observations"
                    )
                else:
                    rec["solve"] = True

        # ---- phase B: planar poses + AX=XB solves, fused into ONE batched
        # dispatch per bucket (fleet.planar_handeye_fleet; the camera->target
        # poses never leave the device). Staged two-dispatch path kept as the
        # compile-failure fallback. ----
        he_recs = [rec for rec in records if rec["solve"]]
        try:
            he_results = (
                fleet.planar_handeye_fleet([
                    (
                        rec["views_obj"], rec["views_uv"], rec["kmtx"],
                        np.stack(rec["bases"]),
                        rec["rig"].min_angle_deg, rec["rig"].options,
                    )
                    for rec in he_recs
                ])
                if he_recs
                else []
            )
        except Exception:  # pragma: no cover — shape/compile failure fallback
            poses = fleet.planar_pose_fleet(pose_jobs) if pose_jobs else []
            he_jobs = [
                (
                    np.stack(rec["bases"]),
                    np.stack([poses[i] for i in rec["pose_idx"]]),
                    rec["rig"].min_angle_deg,
                    rec["rig"].options,
                )
                for rec in he_recs
            ]
            try:
                he_results = fleet.handeye_fleet(he_jobs) if he_jobs else []
            except Exception:  # pragma: no cover
                he_results = []
                for bg, ct, ang, opts in he_jobs:
                    try:
                        he_results.append(estimate_and_optimize_handeye(bg, ct, ang, opts))
                    except Exception as ex:  # noqa: BLE001 — parity (handeye_stage.cpp:185-190)
                        he_results.append(ex)

        # ---- phase C: fill reports and statuses in submission order ----
        for rec, he in zip(he_recs, he_results):
            sj = rec["sj"]
            if isinstance(he, Exception):
                sj["status"] = "estimation_error"
                sj["error"] = str(he)
                continue
            sj["status"] = "ok" if he.core.success else "optimization_failed"
            sj["success"] = he.core.success
            sj["final_cost"] = he.core.final_cost
            sj["report"] = he.core.report
            sj["g_se3_c"] = _pose_json(he.g_se3_c)
            if he.core.covariance is not None:
                sj["covariance"] = he.core.covariance.tolist()
            if he.core.success:
                context.handeye_results.setdefault(rec["rig"].rig_id, {})[
                    rec["sensor_id"]
                ] = he

        for rec in records:
            rec["sensors_json"].append(rec["sj"])
            rec["sensors_artifact"][rec["sensor_id"]] = rec["sj"]

        overall, any_success = True, False
        rigs_json = []
        for rig, rig_json, _, sensors_json in rigs:
            # per-rig success from THIS rig's sensor reports — never from
            # context.handeye_results, whose rig_id key another rig with a
            # duplicate (e.g. default-empty) rig_id may have populated
            rig_any = any(sj.get("status") == "ok" for sj in sensors_json)
            rig_success = all(
                sj.get("status") == "ok" for sj in sensors_json
            ) and bool(sensors_json)
            if rig_any and rig_success:
                rig_json["status"] = "ok"
                any_success = True
            elif rig_any:
                rig_json["status"] = "partial_success"
                any_success = True
                overall = False
            else:
                rig_json["status"] = "failed"
                overall = False
            rig_json["sensor_reports"] = sensors_json
            rigs_json.append(rig_json)

        result.summary["rigs"] = rigs_json
        result.summary["status"], result.success = _aggregate(any_success, overall)
        return result


class BundleAdjustmentStage(CalibrationStage):
    """bundle_stage.cpp:8-169 + detail/bundle_utils.cpp."""

    def name(self) -> str:
        return "bundle"

    def run(self, context: PipelineContext) -> PipelineStageResult:
        import jax.numpy as jnp

        result = PipelineStageResult(name=self.name())
        if not context.intrinsic_results:
            result.summary["status"] = "waiting_for_intrinsic_stage"
            return result
        if not context.has_bundle_config():
            result.summary["status"] = "missing_config"
            return result
        cfg = context.bundle_config()
        if not cfg.rigs:
            result.summary["status"] = "no_rigs_configured"
            return result

        sensor_index = build_sensor_index(context.dataset.planar_cameras)
        context.bundle_results.clear()
        bundle_artifacts = context.artifacts.setdefault("bundle", {})
        he_cfg = context.handeye_config() if context.has_handeye_config() else None

        overall, any_success = True, False

        # ---- phase A: per-rig host walk; defer every device call ----
        pose_jobs: List[tuple] = []  # (obj, uv, kmtx)
        recs = []  # per-rig state; rec["json"] keeps rigs_json order
        for rig in cfg.rigs:
            rig_json = {
                "rig_id": rig.rig_id,
                "sensor_count": len(rig.sensors),
                "min_angle_deg": rig.min_angle_deg,
            }
            rec = {"rig": rig, "json": rig_json, "solve": False}
            recs.append(rec)
            # observation selection with hand-eye fallback (bundle_utils.cpp:30-44)
            observations = rig.observations
            if not observations and he_cfg is not None:
                he_rig = find_handeye_rig(he_cfg, rig.rig_id)
                if he_rig is not None and he_rig.observations:
                    observations = he_rig.observations
            requested = len(observations)
            if not observations:
                rig_json["status"] = "no_observations"
                rig_json["observations"] = {"requested": requested, "used": 0}
                overall = False
                continue

            rig_artifact = bundle_artifacts.setdefault(rig.rig_id, {})
            rig_artifact["options"] = jsonio.to_jsonable(rig.options)
            rig_artifact["min_angle_deg"] = rig.min_angle_deg
            rec["artifact"] = rig_artifact

            # sensor setup (bundle_utils.cpp:9-27)
            missing = [s for s in rig.sensors if s not in context.intrinsic_results]
            if missing:
                rig_json["status"] = "missing_intrinsics"
                rig_json["observations"] = {"requested": requested, "used": 0}
                overall = False
                continue
            cameras = np.stack(
                [context.intrinsic_results[s].refine_result.camera for s in rig.sensors]
            )
            sensor_to_index = {s: i for i, s in enumerate(rig.sensors)}

            # collect observations (bundle_utils.cpp:60-145); planar poses
            # are fleet-solved after this walk
            obs_views, obs_bg, obs_cam_idx = [], [], []
            accum_base: Dict[int, List] = {i: [] for i in range(len(rig.sensors))}
            accum_pose_idx: Dict[int, List] = {i: [] for i in range(len(rig.sensors))}
            views_json = []
            for view_cfg in observations:
                vj = {}
                if view_cfg.view_id:
                    vj["id"] = view_cfg.view_id
                vj["base_pose"] = _pose_json(view_cfg.base_se3_gripper)
                sensor_reports = []
                used = False
                for sensor_id in rig.sensors:
                    se = {"sensor_id": sensor_id}
                    sidx = sensor_to_index[sensor_id]
                    fname = view_cfg.images.get(sensor_id)
                    if fname is None:
                        se["status"] = "missing_image_reference"
                        sensor_reports.append(se)
                        continue
                    det_index = sensor_index.get(sensor_id)
                    if det_index is None:
                        se["status"] = "missing_detections"
                        sensor_reports.append(se)
                        continue
                    img = det_index.image_lookup.get(fname)
                    if img is None:
                        se["status"] = "image_not_in_dataset"
                        se["image"] = fname
                        sensor_reports.append(se)
                        continue
                    camera = context.intrinsic_results[sensor_id].refine_result.camera
                    obj, uv = make_planar_arrays(img)
                    se["image"] = fname
                    se["points"] = obj.shape[0]
                    if obj.shape[0] < 4:
                        se["status"] = "insufficient_points"
                        sensor_reports.append(se)
                        continue
                    obs_views.append((obj, uv))
                    obs_bg.append(np.asarray(view_cfg.base_se3_gripper))
                    obs_cam_idx.append(sidx)
                    accum_base[sidx].append(np.asarray(view_cfg.base_se3_gripper))
                    accum_pose_idx[sidx].append(len(pose_jobs))
                    pose_jobs.append((obj, uv, np.asarray(camera[:5])))
                    se["status"] = "ok"
                    used = True
                    sensor_reports.append(se)
                vj["sensors"] = sensor_reports
                vj["used"] = used
                views_json.append(vj)

            rig_json["observations"] = {"requested": requested, "used": len(obs_views)}
            rig_json["views"] = views_json
            if not obs_views:
                rig_json["status"] = "no_valid_observations"
                overall = False
                continue
            rec.update(
                solve=True, cameras=cameras, obs_views=obs_views, obs_bg=obs_bg,
                obs_cam_idx=obs_cam_idx, accum_base=accum_base,
                accum_pose_idx=accum_pose_idx, views_json=views_json,
            )

        # ---- phase B: hand-eye init SOURCES (host-known info only; the DLT
        # seed values themselves are device work and are deferred) ----
        # (bundle_utils.cpp:148-200 decides and solves per rig x sensor)
        any_dlt = False
        for rec in recs:
            if not rec["solve"]:
                continue
            rig = rec["rig"]
            he_init = np.tile(np.eye(4), (len(rig.sensors), 1, 1))
            he_report = []
            rec["he_failed"] = False
            rec["dlt_sidx"] = []
            rig_he = context.handeye_results.get(rig.rig_id, {})
            for sidx, sensor_id in enumerate(rig.sensors):
                entry = {"sensor_id": sensor_id, "source": "identity"}
                he = rig_he.get(sensor_id)
                if he is not None and he.core.success:
                    he_init[sidx] = he.g_se3_c
                    entry.update(source="handeye", success=True)
                elif len(rec["accum_pose_idx"][sidx]) >= 2:
                    entry["source"] = "dlt"
                    rec["dlt_sidx"].append((sidx, entry))
                    any_dlt = True
                else:
                    entry.update(success=False, error="insufficient_observations")
                    rec["he_failed"] = True
                he_report.append(entry)
            rec["json"]["handeye_initialization"] = he_report
            rec["he_init"] = he_init
            rec["he_report"] = he_report
            # target source (bundle_utils.cpp:202-237): config -> averaged
            # b*X*c (always possible here: solve implies observations) ->
            # identity (unreachable when solve)
            if rig.initial_target is not None:
                rec["target"] = np.asarray(rig.initial_target)
                rec["target_source"] = "config"
            else:
                rec["target_source"] = "estimated"
            if rec["he_failed"] and rig.initial_target is None:
                overall = False

        solve_recs = [rec for rec in recs if rec["solve"]]

        # ---- phase C+D: device work. Fast path (no DLT seeds needed — every
        # hand-eye init is host-known): planar poses + target averaging +
        # bundle LM fused into ONE dispatch per shape bucket
        # (fleet.bundle_fused_fleet). General path: staged dispatches. ----
        bundle_results: List = []
        fused_done = False
        if solve_recs and not any_dlt:
            try:
                jobs_f = []
                for rec in solve_recs:
                    obj_b, uv_b, mask_b = pad_views(rec["obs_views"])
                    cam_idx = np.asarray(rec["obs_cam_idx"])
                    jobs_f.append(
                        fleet.FusedBundleJob(
                            obj=obj_b, uv=uv_b, mask=mask_b,
                            kmtx=rec["cameras"][cam_idx][:, :5],
                            bg=np.stack(rec["obs_bg"]), cam_idx=cam_idx,
                            cameras=rec["cameras"], he_init=rec["he_init"],
                            target_given=rec["target"]
                            if rec["target_source"] == "config"
                            else np.eye(4),
                            use_given_target=rec["target_source"] == "config",
                            opts=rec["rig"].options,
                        )
                    )
                for rec, (br, tgt0) in zip(
                    solve_recs, fleet.bundle_fused_fleet(jobs_f)
                ):
                    rec["target"] = tgt0
                    bundle_results.append(br)
                fused_done = True
            except Exception:  # pragma: no cover — fall back to staged path
                bundle_results = []

        if solve_recs and not fused_done:
            # ---- staged path: C1 planar poses, C2 DLT seeds, C3 target
            # averaging, D bundle — one batched dispatch each ----
            poses = fleet.planar_pose_fleet(pose_jobs) if pose_jobs else []
            dlt_jobs, dlt_slots = [], []
            for rec in solve_recs:
                accum_cam = {
                    sidx: [poses[i] for i in idx_list]
                    for sidx, idx_list in rec["accum_pose_idx"].items()
                }
                rec["accum_cam"] = accum_cam
                for sidx, entry in rec["dlt_sidx"]:
                    dlt_jobs.append((
                        np.stack(rec["accum_base"][sidx]),
                        np.stack(accum_cam[sidx]),
                        rec["rig"].min_angle_deg,
                    ))
                    dlt_slots.append((rec, sidx, entry))

            # C2: one batched DLT dispatch, fill the deferred slots
            try:
                dlt_results = fleet.handeye_dlt_fleet(dlt_jobs) if dlt_jobs else []
            except Exception:  # pragma: no cover — shape/compile failure fallback
                dlt_results = []
                for bg_j, ct_j, ang_j in dlt_jobs:
                    try:
                        pose, ok = handeye_linear.estimate_handeye_dlt(
                            jnp.asarray(bg_j), jnp.asarray(ct_j), ang_j
                        )
                        dlt_results.append((np.asarray(pose), bool(ok)))
                    except Exception as ex:  # noqa: BLE001
                        dlt_results.append(ex)
            for (rec, sidx, entry), res in zip(dlt_slots, dlt_results):
                if isinstance(res, Exception):
                    entry.update(success=False, error=str(res))
                    rec["he_failed"] = True
                    if rec["rig"].initial_target is None:
                        overall = False
                    continue
                pose, ok = res
                rec["he_init"][sidx] = pose
                entry["success"] = bool(ok)
                if not bool(ok):
                    rec["he_failed"] = True
                    if rec["rig"].initial_target is None:
                        overall = False

            # C3: averaged target init per rig (needs the final he_init)
            avg_groups, avg_recs = [], []
            for rec in solve_recs:
                if rec["target_source"] != "estimated":
                    continue
                candidates = []
                for sidx in range(len(rec["rig"].sensors)):
                    for b, c in zip(rec["accum_base"][sidx], rec["accum_cam"][sidx]):
                        candidates.append(b @ rec["he_init"][sidx] @ c)
                avg_groups.append(candidates)
                avg_recs.append(rec)
            for rec, avg in zip(avg_recs, fleet.average_isometries_fleet(avg_groups)):
                rec["target"] = avg

            # ---- phase D: one batched bundle dispatch per shape bucket ----
            jobs = []
            for rec in solve_recs:
                obj_b, uv_b, mask_b = pad_views(rec["obs_views"])
                jobs.append(
                    fleet.BundleJob(
                        obj=obj_b, uv=uv_b, bg=np.stack(rec["obs_bg"]),
                        cam_idx=np.asarray(rec["obs_cam_idx"]), cameras=rec["cameras"],
                        he_init=rec["he_init"], target=rec["target"], mask=mask_b,
                        opts=rec["rig"].options,
                    )
                )
            try:
                bundle_results = fleet.bundle_fleet(jobs) if jobs else []
            except Exception:  # pragma: no cover — shape/compile failure fallback
                bundle_results = []
                for job in jobs:
                    try:
                        bundle_results.append(
                            optimize_bundle(
                                job.obj, job.uv, job.bg, job.cam_idx, job.cameras,
                                job.he_init, job.target, mask=jnp.asarray(job.mask),
                                opts=job.opts,
                            )
                        )
                    except Exception as ex:  # noqa: BLE001 — parity (bundle_stage.cpp:146-151)
                        bundle_results.append(ex)

        # ---- phase E: fill reports in rig order ----
        for rec, br in zip(solve_recs, bundle_results):
            rig = rec["rig"]
            rig_json = rec["json"]
            rig_artifact = rec["artifact"]
            rig_json["initial_target_source"] = rec["target_source"]
            rig_artifact["initial_hand_eye"] = rec["he_report"]
            rig_artifact["initial_target"] = _pose_json(rec["target"])
            if isinstance(br, Exception):
                rig_json["status"] = "optimization_error"
                rig_json["error"] = str(br)
                rig_artifact["error"] = str(br)
                overall = False
                continue
            result_json = {
                "success": br.core.success,
                "final_cost": br.core.final_cost,
                "report": br.core.report,
                "b_se3_t": _pose_json(br.b_se3_t),
                "g_se3_c": [_pose_json(m) for m in br.g_se3_c],
                "cameras": [c.tolist() for c in br.cameras],
            }
            if br.core.covariance is not None:
                result_json["covariance"] = br.core.covariance.tolist()
            rig_artifact["result"] = result_json
            rig_artifact["views"] = rec["views_json"]
            rig_json["success"] = br.core.success
            rig_json["final_cost"] = br.core.final_cost
            if br.core.success:
                rig_json["status"] = "ok"
                any_success = True
                context.bundle_results[rig.rig_id] = br
            else:
                rig_json["status"] = "optimization_failed"
                overall = False

        result.summary["rigs"] = [rec["json"] for rec in recs]
        result.summary["status"], result.success = _aggregate(any_success, overall)
        return result
