"""CLI error-path tests: every app must fail a bad invocation with a
one-line stderr message and exit code 1, never a traceback (reference apps
behave the same via CLI11 + catch-all, e.g. planar_intrinsics.cpp:103-108).

These run the real ``python -m calibration_tpu.apps.*`` entry points in
subprocesses; all cases fail during input validation, before any device
compute, so they are cheap despite the jax import.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(module, *argv):
    out = subprocess.run(
        [sys.executable, "-m", f"calibration_tpu.apps.{module}", *argv],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    return out


def _assert_clean_failure(out, needle):
    assert out.returncode == 1, f"rc={out.returncode}\nstderr={out.stderr}"
    assert needle in out.stderr, out.stderr
    assert "Traceback" not in out.stderr, out.stderr


def test_homography_missing_input_file():
    out = _run("homography", "--input", "/nonexistent/input.json")
    _assert_clean_failure(out, "Failed to open input file")


def test_homography_insufficient_points(tmp_path):
    p = tmp_path / "in.json"
    p.write_text(json.dumps({
        "correspondences": [
            {"object_xy": [0.0, 0.0], "image_uv": [10.0, 10.0]},
            {"object_xy": [1.0, 0.0], "image_uv": [20.0, 10.0]},
        ]
    }))
    out = _run("homography", "--input", str(p))
    _assert_clean_failure(out, "Failed to estimate homography")


def test_planar_intrinsics_feature_camera_count_mismatch(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "cameras": [
            {"camera_id": "cam0", "model": "pinhole"},
            {"camera_id": "cam1", "model": "pinhole"},
        ],
        "options": {},
    }))
    feats = tmp_path / "f0.json"
    feats.write_text(json.dumps({"sensor_id": "cam0", "images": []}))
    out = _run(
        "planar_intrinsics", "--config", str(cfg),
        "--features", str(feats), str(feats), str(feats),
    )
    _assert_clean_failure(out, "does not match cameras")


def test_planar_intrinsics_missing_config():
    out = _run(
        "planar_intrinsics", "--config", "/nonexistent/cfg.json",
        "--features", "/nonexistent/f.json",
    )
    _assert_clean_failure(out, "Calibration failed")


def test_linescan_malformed_laser_uv(tmp_path):
    p = tmp_path / "ls.json"
    p.write_text(json.dumps({
        "camera": {"kmtx": {"fx": 600, "fy": 600, "cx": 320, "cy": 240}},
        "views": [{
            "target_view": [
                {"object_xy": [0, 0], "image_uv": [10, 10]},
                {"object_xy": [1, 0], "image_uv": [20, 10]},
                {"object_xy": [0, 1], "image_uv": [10, 20]},
                {"object_xy": [1, 1], "image_uv": [20, 20]},
            ],
            "laser_uv": [1.0, 2.0, 3.0],  # flat, not [[u,v],...]
        }],
    }))
    out = _run("linescan_calibration", "--input", str(p), "--output", str(tmp_path / "o.json"))
    _assert_clean_failure(out, "Linescan calibration failed")


def test_bundle_pipeline_missing_input():
    out = _run("bundle_pipeline", "--input", "/nonexistent/b.json", "--output", "/tmp/nope.json")
    _assert_clean_failure(out, "")  # any one-line error; rc 1, no traceback
