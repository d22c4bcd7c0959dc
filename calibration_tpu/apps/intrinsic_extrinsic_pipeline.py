"""Intrinsics + extrinsics (stereo or multicam) pipeline CLI (reference:
apps/examples/intrinsic_extrinsic_pipeline.cpp:28-155).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from .. import native


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Planar intrinsics and extrinsics calibration example (stereo or multicam)"
    )
    parser.add_argument("--input", required=True, help="Pipeline input configuration JSON")
    parser.add_argument("--output", default="artifacts.json")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    from ..io import jsonio
    from ..pipeline import (
        CalibrationPipeline,
        IntrinsicStage,
        JsonPlanarDatasetLoader,
        LoggingDecorator,
        PipelineContext,
        StereoCalibrationStage,
    )
    from ..pipeline.facades.extrinsics import (
        MultiCameraCalibrationFacade,
        MultiCameraRigConfig,
        StereoCalibrationConfig,
    )
    from ..pipeline.facades.intrinsics import load_calibration_config
    from ._common import load_json_file, report_to_json, resolve_path

    try:
        config_json = load_json_file(args.input)
        base_dir = Path(args.input).resolve().parent

        intrinsics_path = resolve_path(base_dir, config_json["planar_intrinsics_config"])
        planar_cfg = load_calibration_config(intrinsics_path)
        if planar_cfg is None:
            raise RuntimeError(
                f"Failed to load planar intrinsics config from {intrinsics_path}"
            )

        loader = JsonPlanarDatasetLoader()
        for entry in config_json["planar_detections"]:
            loader.add_entry(resolve_path(base_dir, entry["path"]), entry["sensor_id"])

        context = PipelineContext()
        context.set_intrinsics_config(planar_cfg)
        if "stereo" in config_json:
            context.set_stereo_config(
                jsonio.from_jsonable(config_json["stereo"], StereoCalibrationConfig)
            )

        pipeline = CalibrationPipeline()
        if args.verbose:
            pipeline.add_decorator(LoggingDecorator(sys.stderr))
        pipeline.add_stage(IntrinsicStage())
        if context.has_stereo_config():
            pipeline.add_stage(StereoCalibrationStage())

        report = pipeline.execute(loader, context)
        context.artifacts["pipeline_summary"] = report_to_json(report)

        mc_failed = False
        if "multicam" in config_json:
            mc = config_json["multicam"]
            rig_jsons = mc if isinstance(mc, list) else [mc]
            rigs = [jsonio.from_jsonable(r, MultiCameraRigConfig) for r in rig_jsons]
            det_by_sensor = {
                d.sensor_id: d for d in context.dataset.planar_cameras if d.sensor_id
            }
            facade = MultiCameraCalibrationFacade()
            mc_artifacts = context.artifacts.setdefault("multicam", {})
            # fleet dispatch: one batched DLT+LM per rig shape bucket
            # (pipeline/fleet.py::extrinsics_fleet) instead of one per rig
            runs = facade.calibrate_many(
                [(rig, det_by_sensor, context.intrinsic_results) for rig in rigs]
            )
            for rig, run in zip(rigs, runs):
                if isinstance(run, Exception):
                    # pre-fleet contract: a facade exception exited 1; keep
                    # the exit code but still report the other rigs
                    print(f"Multicam calibration failed: {run}", file=sys.stderr)
                    mc_artifacts[rig.rig_id or "rig0"] = {
                        "success": False, "error": str(run),
                    }
                    mc_failed = True
                    continue
                entry = {
                    "success": run.success,
                    "requested_views": run.requested_views,
                    "used_views": run.used_views,
                    "sensors": run.sensors,
                    "initial_guess": {
                        "c_se3_r": [np.asarray(m).tolist() for m in run.initial_guess.c_se3_r],
                        "r_se3_t": [np.asarray(m).tolist() for m in run.initial_guess.r_se3_t],
                    },
                }
                if run.optimization is not None:
                    entry["optimization"] = {
                        "success": run.optimization.core.success,
                        "final_cost": run.optimization.core.final_cost,
                        "report": run.optimization.core.report,
                        "cameras": [c.tolist() for c in run.optimization.cameras],
                        "c_se3_r": [m.tolist() for m in run.optimization.c_se3_r],
                        "r_se3_t": [m.tolist() for m in run.optimization.r_se3_t],
                    }
                mc_artifacts[rig.rig_id or "rig0"] = entry

        Path(args.output).write_text(native.dumps_fast(context.artifacts, indent=2) + "\n")
        print(f"Calibration artifacts written to {args.output}")
        return 0 if (report.success and not mc_failed) else 1
    except Exception as ex:  # noqa: BLE001
        print(f"Calibration pipeline failed: {ex}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
