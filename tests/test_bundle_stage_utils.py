"""Direct unit tests for the BundleAdjustmentStage's selection / setup /
initialization ladders — the analogue of the reference's
tests/unit/bundle_stage_utils_test.cpp (all eight cases), exercised through
``BundleAdjustmentStage.run`` on hand-crafted contexts (the rebuild inlines
bundle_utils.cpp into the stage's phase A-C walk, pipeline/stages.py).
"""

import dataclasses

import numpy as np

import synth
from calibration_tpu.optim import BundleOptions, OptimOptions
from calibration_tpu.optim.core import OptimResult
from calibration_tpu.optim.handeye import HandeyeResult
from calibration_tpu.optim.intrinsics import IntrinsicsOptimizationResult
from calibration_tpu.pipeline import BundleAdjustmentStage, PipelineContext
from calibration_tpu.pipeline.dataset import (
    CalibrationDataset,
    PlanarDetections,
    PlanarImageDetections,
    PlanarTargetPoint,
)
from calibration_tpu.pipeline.facades.handeye import (
    BundlePipelineConfig,
    BundleRigConfig,
    HandEyeObservationConfig,
    HandEyePipelineConfig,
    HandEyeRigConfig,
)
from calibration_tpu.pipeline.facades.intrinsics import IntrinsicCalibrationOutputs

FAST_BUNDLE = BundleOptions(
    core=OptimOptions(max_iterations=40, compute_covariance=False)
)


def _fake_intrinsics(intr=None) -> IntrinsicCalibrationOutputs:
    """make_intrinsics_result analogue (bundle_stage_utils_test.cpp:25-30):
    a successful refine result carrying flat pinhole params directly."""
    camera = np.asarray(intr if intr is not None else synth.default_camera())
    out = IntrinsicCalibrationOutputs()
    out.refine_result = IntrinsicsOptimizationResult(
        core=OptimResult(success=True),
        camera=camera,
        c_se3_t=np.zeros((0, 4, 4)),
        view_errors=np.zeros(0),
    )
    return out


def _detections(intr, poses, obj, sensor_id="cam0"):
    uv = synth.render_pixels(intr, poses, obj)
    det = PlanarDetections(sensor_id=sensor_id, feature_type="synthetic")
    for v in range(uv.shape[0]):
        img = PlanarImageDetections(file=f"img_{v:03d}.png")
        for j in range(obj.shape[0]):
            img.points.append(
                PlanarTargetPoint(
                    x=float(uv[v, j, 0]), y=float(uv[v, j, 1]), id=j,
                    local_x=float(obj[j, 0]), local_y=float(obj[j, 1]),
                    local_z=0.0,
                )
            )
        det.images.append(img)
    return det


def _context(dets, rigs, he_rigs=None, sensors=("cam0",), intr=None):
    ctx = PipelineContext()
    ctx.dataset = CalibrationDataset(planar_cameras=list(dets))
    for s in sensors:
        ctx.intrinsic_results[s] = _fake_intrinsics(intr)
    if he_rigs is not None:
        ctx.set_handeye_config(HandEyePipelineConfig(rigs=list(he_rigs)))
    ctx.set_bundle_config(BundlePipelineConfig(rigs=list(rigs)))
    return ctx


def _rig_fixture(num_views=4):
    """Tiny renderable cell: known camera, grid target, circle poses."""
    intr = synth.default_camera()
    obj = synth.make_target_grid(4, 5, 0.05)
    c_se3_t = synth.circle_views(num_views=num_views)
    dets = _detections(intr, c_se3_t, obj)
    obs = [
        HandEyeObservationConfig(
            view_id=f"v{i}", base_se3_gripper=np.eye(4),
            images={"cam0": f"img_{i:03d}.png"},
        )
        for i in range(num_views)
    ]
    return intr, obj, c_se3_t, dets, obs


def test_selects_rig_observations_before_handeye_fallback():
    """bundle_stage_utils_test.cpp:49-61: a rig with its own observations
    never falls through to the hand-eye config's rig of the same id."""
    rig_obs = [HandEyeObservationConfig(view_id="from_rig")]
    he_obs = [HandEyeObservationConfig(view_id="from_handeye")]
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], observations=rig_obs,
                          options=FAST_BUNDLE)
    he = HandEyeRigConfig(rig_id="rig", sensors=["cam0"], observations=he_obs)
    ctx = _context([], [rig], he_rigs=[he])
    res = BundleAdjustmentStage().run(ctx)
    rj = res.summary["rigs"][0]
    assert rj["observations"]["requested"] == 1
    assert rj["views"][0]["id"] == "from_rig"


def test_selects_handeye_observations_when_rig_empty():
    """bundle_stage_utils_test.cpp:63-79."""
    he_obs = [HandEyeObservationConfig(view_id="from_handeye")]
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], options=FAST_BUNDLE)
    he = HandEyeRigConfig(rig_id="rig", sensors=["cam0"], observations=he_obs)
    ctx = _context([], [rig], he_rigs=[he])
    res = BundleAdjustmentStage().run(ctx)
    rj = res.summary["rigs"][0]
    assert rj["observations"]["requested"] == 1
    assert rj["views"][0]["id"] == "from_handeye"
    # and with no fallback source at all: no_observations
    ctx2 = _context([], [dataclasses.replace(rig)], he_rigs=[])
    rj2 = BundleAdjustmentStage().run(ctx2).summary["rigs"][0]
    assert rj2["status"] == "no_observations"


def test_sensor_setup_reports_missing_sensors():
    """bundle_stage_utils_test.cpp:81-93: a sensor without an intrinsics
    result stops the rig with missing_intrinsics."""
    rig = BundleRigConfig(
        rig_id="rig", sensors=["cam0", "cam1"],
        observations=[HandEyeObservationConfig(view_id="v0")],
        options=FAST_BUNDLE,
    )
    ctx = _context([], [rig], sensors=("cam0",))  # cam1 missing
    res = BundleAdjustmentStage().run(ctx)
    rj = res.summary["rigs"][0]
    assert rj["status"] == "missing_intrinsics"
    assert not res.success


def test_collect_observations_builds_view_summaries():
    """bundle_stage_utils_test.cpp:95-130: per-view JSON carries per-sensor
    status, point counts and the used flag; the sensor-status ladder
    (missing_image_reference / image_not_in_dataset / ok) is exercised."""
    intr, obj, c_se3_t, dets, obs = _rig_fixture(num_views=2)
    obs.append(HandEyeObservationConfig(view_id="no_ref", images={}))
    obs.append(
        HandEyeObservationConfig(view_id="ghost", images={"cam0": "nope.png"})
    )
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], observations=obs,
                          options=FAST_BUNDLE)
    ctx = _context([dets], [rig])
    res = BundleAdjustmentStage().run(ctx)
    rj = res.summary["rigs"][0]
    assert rj["observations"] == {"requested": 4, "used": 2}
    views = rj["views"]
    assert views[0]["used"] and views[0]["sensors"][0]["status"] == "ok"
    assert views[0]["sensors"][0]["points"] == obj.shape[0]
    assert "base_pose" in views[0]
    assert views[2]["sensors"][0]["status"] == "missing_image_reference"
    assert not views[2]["used"]
    assert views[3]["sensors"][0]["status"] == "image_not_in_dataset"


def test_handeye_initialization_prefers_existing_results():
    """bundle_stage_utils_test.cpp:132-152: a successful hand-eye stage
    result wins over the DLT (which IS available here: >=2 observations)."""
    intr, obj, c_se3_t, dets, obs = _rig_fixture(num_views=4)
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], observations=obs,
                          options=FAST_BUNDLE)
    ctx = _context([dets], [rig])
    g = np.eye(4)
    g[0, 3] = 1.0
    ctx.handeye_results["rig"] = {
        "cam0": HandeyeResult(core=OptimResult(success=True), g_se3_c=g)
    }
    res = BundleAdjustmentStage().run(ctx)
    he_report = res.summary["rigs"][0]["handeye_initialization"]
    assert he_report[0]["source"] == "handeye"
    assert he_report[0]["success"] is True
    # the same report lands in the artifacts (bundle_stage.cpp:102,108)
    assert ctx.artifacts["bundle"]["rig"]["initial_hand_eye"][0]["source"] == "handeye"


def test_initial_target_from_configuration():
    """bundle_stage_utils_test.cpp:154-165."""
    intr, obj, c_se3_t, dets, obs = _rig_fixture(num_views=4)
    target = np.eye(4)
    target[1, 3] = 1.0
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], observations=obs,
                          options=FAST_BUNDLE, initial_target=target)
    ctx = _context([dets], [rig])
    res = BundleAdjustmentStage().run(ctx)
    rj = res.summary["rigs"][0]
    assert rj["initial_target_source"] == "config"
    art = np.asarray(ctx.artifacts["bundle"]["rig"]["initial_target"])
    assert abs(art[1, 3] - 1.0) < 1e-9


def test_initial_target_estimated_from_accumulated_poses():
    """bundle_stage_utils_test.cpp:167-183: no config target -> averaged
    b_se3_g @ X @ c_se3_t. With identity bases and identity hand-eye the
    estimate is the averaged camera->target pose, which the planar-pose
    fleet recovers from the rendered detections."""
    intr, obj, c_se3_t, dets, obs = _rig_fixture(num_views=2)
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], observations=obs,
                          options=FAST_BUNDLE)
    ctx = _context([dets], [rig])
    ctx.handeye_results["rig"] = {
        "cam0": HandeyeResult(core=OptimResult(success=True), g_se3_c=np.eye(4))
    }
    res = BundleAdjustmentStage().run(ctx)
    rj = res.summary["rigs"][0]
    assert rj["initial_target_source"] == "estimated"
    art = np.asarray(ctx.artifacts["bundle"]["rig"]["initial_target"])
    mean_t = np.mean(np.asarray(c_se3_t)[:, :3, 3], axis=0)
    np.testing.assert_allclose(art[:3, 3], mean_t, atol=5e-2)


def test_handeye_initialization_signals_failure_without_data():
    """bundle_stage_utils_test.cpp:185-198: one usable observation (accum
    < 2 pairs), no prior hand-eye result -> identity init flagged failed."""
    intr, obj, c_se3_t, dets, obs = _rig_fixture(num_views=1)
    rig = BundleRigConfig(rig_id="rig", sensors=["cam0"], observations=obs,
                          options=FAST_BUNDLE)
    ctx = _context([dets], [rig])
    res = BundleAdjustmentStage().run(ctx)
    he_report = res.summary["rigs"][0]["handeye_initialization"]
    assert he_report[0]["source"] == "identity"
    assert he_report[0]["success"] is False
    assert he_report[0]["error"] == "insufficient_observations"
    assert not res.success
