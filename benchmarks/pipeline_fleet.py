"""Synthetic fleet generator for the full-JSON-pipeline benchmark
(BASELINE.md config 5 *as specified*: the stages + facades + artifact
orchestration path, not just the solver core).

Builds R independent robot cells ("rigs"), each with its own camera sensor,
hand-eye transform, base->target pose and 12 hand-eye observations, and
writes the same JSON tree `apps.bundle_pipeline` consumes (detections files,
planar-intrinsics config, hand-eye + bundle sections). The pipeline then
runs: JSON load -> IntrinsicStage (fleet dispatch over all R sensors) ->
HandEyeCalibrationStage (per rig) -> BundleAdjustmentStage (per rig) ->
artifacts JSON. Reference analogue: apps/examples/bundle_pipeline.cpp:39-139
executed once per cell.

Pure numpy — reuses benchmarks/problems.py helpers.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from . import problems as pb


def make_fleet(outdir, rigs=16, num_obs=12, rows=8, cols=11, noise=0.05, seed=29):
    """Write the JSON tree into ``outdir`` and return the raw per-rig arrays
    for the sequential CPU floor: dict with obj (R, O, N, 2), uv, bg
    (R, O, 4, 4), ct_gt (R, O, 4, 4), intr (10,), g_gt (R, 4, 4),
    bt_gt (R, 4, 4), input_path.
    """
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    obj = pb.grid(rows, cols, 0.03)
    n = obj.shape[0]
    intr = np.array([600.0, 610.0, 320.0, 240.0, 0.0, -0.12, 0.04, 0.0, 1e-4, -5e-5])

    obj_b = np.tile(obj[None, None], (rigs, num_obs, 1, 1))
    uv_b = np.zeros((rigs, num_obs, n, 2))
    bg_b = np.zeros((rigs, num_obs, 4, 4))
    ct_b = np.zeros((rigs, num_obs, 4, 4))
    g_b = np.zeros((rigs, 4, 4))
    bt_b = np.zeros((rigs, 4, 4))

    detections_entries = []
    cameras_cfg = []
    he_rigs = []
    bundle_rigs = []

    for r in range(rigs):
        sensor = f"cam{r}"
        g = pb.pose(rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.06, 0.06, 3))
        bt = pb.pose(rng.uniform(-0.2, 0.2, 3), [0.4, -0.1, 0.2] + rng.uniform(-0.05, 0.05, 3))
        g_b[r], bt_b[r] = g, bt

        images = []
        he_obs = []
        for i in range(num_obs):
            # physically constructed: camera faces the target (CLAUDE.md
            # invariant — random gripper poses put the target behind the lens)
            ct = pb.pose(rng.uniform(-0.4, 0.4, 3), rng.uniform(-0.08, 0.08, 3) + [0, 0, 0.8])
            bg = bt @ np.linalg.inv(ct) @ np.linalg.inv(g)
            pc = np.concatenate([obj, np.zeros((n, 1))], -1) @ ct[:3, :3].T + ct[:3, 3]
            uv = pb.np_project(intr, pc) + rng.normal(0, noise, (n, 2))
            uv_b[r, i], bg_b[r, i], ct_b[r, i] = uv, bg, ct
            fname = f"{sensor}_he_{i:03d}.png"
            images.append(
                {
                    "file": fname,
                    "points": [
                        {
                            "x": float(uv[j, 0]), "y": float(uv[j, 1]), "id": int(j),
                            "local_x": float(obj[j, 0]), "local_y": float(obj[j, 1]),
                            "local_z": 0.0,
                        }
                        for j in range(n)
                    ],
                }
            )
            he_obs.append(
                {
                    "view_id": f"v{i}",
                    "base_se3_gripper": bg.tolist(),
                    "images": {sensor: fname},
                }
            )

        det = {
            "image_directory": "synthetic", "feature_type": "synthetic_grid",
            "algo_version": "1", "params_hash": "bench", "sensor_id": sensor,
            "tags": ["synthetic"], "metadata": {}, "source_file": "",
            "images": images,
        }
        det_path = out / f"detections_{sensor}.json"
        det_path.write_text(json.dumps(det))
        detections_entries.append({"sensor_id": sensor, "path": det_path.name})
        cameras_cfg.append(
            {"camera_id": sensor, "model": "pinhole_brown_conrady", "image_size": [640, 480]}
        )
        he_rigs.append(
            {
                "rig_id": f"rig{r}", "sensors": [sensor], "observations": he_obs,
                "options": {"huber_delta": 1.0}, "min_angle_deg": 1.0,
            }
        )
        bundle_rigs.append(
            {
                "rig_id": f"rig{r}", "sensors": [sensor],
                "options": {"optimize_intrinsics": False}, "min_angle_deg": 1.0,
            }
        )

    (out / "planar_intrinsics_config.json").write_text(
        json.dumps(
            {
                "algorithm": "planar",
                "options": {
                    "optim_options": {"core": {"huber_delta": 1.0, "max_iterations": 200}},
                    "min_corners_per_view": 20,
                    "refine": True,
                },
                "cameras": cameras_cfg,
            }
        )
    )
    input_path = out / "bundle_input.json"
    input_path.write_text(
        json.dumps(
            {
                "planar_intrinsics_config": "planar_intrinsics_config.json",
                "planar_detections": detections_entries,
                "hand_eye": {"rigs": he_rigs},
                "bundle": {"rigs": bundle_rigs},
            }
        )
    )
    return {
        "obj": obj_b, "uv": uv_b, "bg": bg_b, "ct_gt": ct_b,
        "intr": intr, "g_gt": g_b, "bt_gt": bt_b, "input_path": str(input_path),
    }


def run_pipeline(input_path, output_path=None):
    """Execute the full JSON pipeline in-process exactly as
    apps.bundle_pipeline does (load configs -> stages -> artifacts JSON) and
    return (rc, artifacts_path)."""
    from calibration_tpu.apps.bundle_pipeline import main as app_main

    out = output_path or str(Path(input_path).parent / "artifacts.json")
    rc = app_main(["--input", str(input_path), "--output", out])
    return rc, out
