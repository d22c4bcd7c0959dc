"""End-to-end pipeline CLI: intrinsics -> stereo -> hand-eye (reference:
apps/examples/calibration_pipeline.cpp:31-93).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from .. import native


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="End-to-end calibration pipeline (intrinsics -> stereo -> hand-eye)"
    )
    parser.add_argument("--config", required=True, help="Planar calibration configuration")
    parser.add_argument(
        "--features", required=True, nargs="+",
        help="Feature dataset files. Accepts path or sensor_id=path syntax.",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    from ..pipeline import (
        CalibrationPipeline,
        HandEyeCalibrationStage,
        IntrinsicStage,
        JsonPlanarDatasetLoader,
        LoggingDecorator,
        PipelineContext,
        StereoCalibrationStage,
    )
    from ..pipeline.facades.intrinsics import load_calibration_config
    from ._common import report_to_json, split_sensor_entry

    try:
        config = load_calibration_config(args.config)
        if config is None:
            raise RuntimeError(f"Failed to load calibration config from {args.config}")

        loader = JsonPlanarDatasetLoader()
        for entry in args.features:
            sensor_id, path = split_sensor_entry(entry)
            if not Path(path).exists():
                raise RuntimeError(f"Feature file not found: {path}")
            loader.add_entry(path, sensor_id)

        context = PipelineContext()
        context.set_intrinsics_config(config)

        pipeline = CalibrationPipeline()
        if args.verbose:
            pipeline.add_decorator(LoggingDecorator(sys.stderr))
        pipeline.add_stage(IntrinsicStage())
        pipeline.add_stage(StereoCalibrationStage())
        pipeline.add_stage(HandEyeCalibrationStage())

        report = pipeline.execute(loader, context)
        print(native.dumps_fast(report_to_json(report), indent=2))
        return 0 if report.success else 1
    except Exception as ex:  # noqa: BLE001
        print(f"Pipeline execution failed: {ex}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
