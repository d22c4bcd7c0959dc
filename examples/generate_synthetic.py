"""Generate synthetic example inputs for every CLI app.

Writes JSON files into examples/data/: a homography problem, planar
detections + configs for one and two cameras, a hand-eye/bundle pipeline
input, and a line-scan input — the sample-file role of the reference's
apps/examples/*.json, but self-consistent (the reference ships a stale
homography sample, SURVEY.md section 2 L4 note).

Run: python examples/generate_synthetic.py [outdir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def main(outdir="examples/data"):
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    from calibration_tpu.models import pinhole
    from calibration_tpu.ops import homography as H
    from calibration_tpu.ops import se3

    rng = np.random.default_rng(20260816)

    # --- homography input -------------------------------------------------
    hm = np.array([[1.1, 0.05, 20.0], [-0.02, 0.97, -8.0], [5e-5, -1e-4, 1.0]])
    src = rng.uniform(-2, 2, (30, 2))
    dst = np.array(H.apply_homography(jnp.asarray(hm), jnp.asarray(src)))
    dst += rng.normal(0, 0.02, dst.shape)
    (out / "homography_input.json").write_text(
        json.dumps(
            {
                "correspondences": [
                    {"object_xy": s.tolist(), "image_uv": d.tolist()}
                    for s, d in zip(src, dst)
                ],
                "optimize": True,
                "options": {"huber_delta": 1.0, "max_iterations": 100},
            },
            indent=2,
        )
    )

    # --- planar detections for two cameras --------------------------------
    kmtx = np.array([600.0, 610.0, 320.0, 240.0, 0.0])
    dist = np.array([-0.12, 0.04, 0.0, 1e-4, -5e-5])
    intr = np.concatenate([kmtx, dist])
    rows, cols, pitch = 8, 11, 0.03
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    obj = np.stack([xs.ravel() * pitch, ys.ravel() * pitch], -1)
    obj -= obj.mean(0)
    n = obj.shape[0]

    c1_se3_c0 = np.eye(4)
    c1_se3_c0[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray([0.02, -0.3, 0.01])))
    c1_se3_c0[:3, 3] = [-0.2, 0.0, 0.02]

    def view_pose(i, v_total=10):
        ang = 2 * np.pi * i / v_total
        w = np.array([0.3 * np.cos(ang), 0.3 * np.sin(ang), 0.1 * np.sin(2 * ang)])
        m = np.eye(4)
        m[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray(w)))
        m[:3, 3] = [0.05 * np.cos(ang), 0.05 * np.sin(ang), 0.9 + 0.05 * np.sin(ang)]
        return m

    def render(cam_intr, pose):
        obj3 = np.concatenate([obj, np.zeros((n, 1))], -1)
        pc = obj3 @ pose[:3, :3].T + pose[:3, 3]
        uv = np.asarray(pinhole.project(jnp.asarray(cam_intr), jnp.asarray(pc)))
        return uv + rng.normal(0, 0.05, uv.shape)

    def detections_json(sensor, poses, cam_intr):
        return {
            "image_directory": "synthetic",
            "feature_type": "synthetic_grid",
            "algo_version": "1",
            "params_hash": "example",
            "sensor_id": sensor,
            "tags": ["synthetic"],
            "metadata": {"detector": {"name": "synthetic_grid", "rows": rows, "cols": cols}},
            "source_file": "",
            "images": [
                {
                    "file": f"{sensor}_img_{i:03d}.png",
                    "points": [
                        {
                            "x": float(uv[j, 0]), "y": float(uv[j, 1]), "id": int(j),
                            "local_x": float(obj[j, 0]), "local_y": float(obj[j, 1]),
                            "local_z": 0.0,
                        }
                        for j in range(n)
                    ],
                }
                for i, uv in enumerate(render(cam_intr, p) for p in poses)
            ],
        }

    poses0 = [view_pose(i) for i in range(10)]
    poses1 = [c1_se3_c0 @ p for p in poses0]
    (out / "detections_cam0.json").write_text(json.dumps(detections_json("cam0", poses0, intr)))
    (out / "detections_cam1.json").write_text(json.dumps(detections_json("cam1", poses1, intr)))

    config = {
        "algorithm": "planar",
        "options": {
            "optim_options": {"core": {"huber_delta": 1.0, "max_iterations": 200}},
            "min_corners_per_view": 20,
            "refine": True,
        },
        "cameras": [
            {"camera_id": "cam0", "model": "pinhole_brown_conrady", "image_size": [640, 480]},
            {"camera_id": "cam1", "model": "pinhole_brown_conrady", "image_size": [640, 480]},
        ],
    }
    (out / "planar_intrinsics_config.json").write_text(json.dumps(config, indent=2))
    cfg_single = dict(config)
    cfg_single["cameras"] = config["cameras"][:1]
    (out / "planar_intrinsics_config_single.json").write_text(json.dumps(cfg_single, indent=2))

    # --- stereo/multicam pipeline input ------------------------------------
    stereo_views = [
        {"reference_image": f"cam0_img_{i:03d}.png", "target_image": f"cam1_img_{i:03d}.png"}
        for i in range(10)
    ]
    (out / "pipeline_input.json").write_text(
        json.dumps(
            {
                "planar_intrinsics_config": "planar_intrinsics_config.json",
                "planar_detections": [
                    {"sensor_id": "cam0", "path": "detections_cam0.json"},
                    {"sensor_id": "cam1", "path": "detections_cam1.json"},
                ],
                "stereo": {
                    "pairs": [
                        {
                            "pair_id": "pair0",
                            "reference_sensor": "cam0",
                            "target_sensor": "cam1",
                            "views": stereo_views,
                            "options": {"optimize_intrinsics": True},
                        }
                    ]
                },
                "multicam": [
                    {
                        "rig_id": "rig0",
                        "sensors": ["cam0", "cam1"],
                        "views": [
                            {
                                "images": {
                                    "cam0": f"cam0_img_{i:03d}.png",
                                    "cam1": f"cam1_img_{i:03d}.png",
                                }
                            }
                            for i in range(10)
                        ],
                        "options": {"optimize_intrinsics": True},
                    }
                ],
            },
            indent=2,
        )
    )

    # --- hand-eye / bundle input -------------------------------------------
    g_se3_c = np.eye(4)
    g_se3_c[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray([0.1, -0.2, 0.15])))
    g_se3_c[:3, 3] = [0.02, -0.03, 0.05]
    b_se3_t = np.eye(4)
    b_se3_t[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray([0.05, 0.03, -0.08])))
    b_se3_t[:3, 3] = [0.4, -0.1, 0.2]

    he_images = []
    he_obs = []
    for i in range(12):
        # physical construction: camera views the target (t_z > 0); the
        # gripper pose follows from bg = bt * ct^-1 * g^-1
        w = rng.uniform(-0.4, 0.4, 3)
        t = rng.uniform(-0.08, 0.08, 3) + [0, 0, 0.7]
        ct = np.eye(4)
        ct[:3, :3] = np.asarray(se3.exp_so3(jnp.asarray(w)))
        ct[:3, 3] = t
        bg = b_se3_t @ np.linalg.inv(ct) @ np.linalg.inv(g_se3_c)
        uv = render(intr, ct)
        he_images.append(
            {
                "file": f"he_img_{i:03d}.png",
                "points": [
                    {"x": float(uv[j, 0]), "y": float(uv[j, 1]), "id": int(j),
                     "local_x": float(obj[j, 0]), "local_y": float(obj[j, 1]), "local_z": 0.0}
                    for j in range(n)
                ],
            }
        )
        he_obs.append(
            {
                "view_id": f"v{i}",
                "base_se3_gripper": bg.tolist(),
                "images": {"cam0": f"he_img_{i:03d}.png"},
            }
        )

    he_detections = {
        "image_directory": "synthetic", "feature_type": "synthetic_grid",
        "algo_version": "1", "params_hash": "example", "sensor_id": "cam0",
        "tags": ["synthetic"], "metadata": {"detector": {"name": "synthetic_grid"}},
        "source_file": "", "images": he_images,
    }
    (out / "detections_handeye.json").write_text(json.dumps(he_detections))
    (out / "bundle_input.json").write_text(
        json.dumps(
            {
                "planar_intrinsics_config": "planar_intrinsics_config_single.json",
                "planar_detections": [
                    {"sensor_id": "cam0", "path": "detections_handeye.json"}
                ],
                "hand_eye": {
                    "rigs": [
                        {
                            "rig_id": "rig0", "sensors": ["cam0"], "observations": he_obs,
                            "options": {"huber_delta": 1.0}, "min_angle_deg": 1.0,
                        }
                    ]
                },
                "bundle": {
                    "rigs": [
                        {
                            "rig_id": "rig0", "sensors": ["cam0"],
                            "options": {"optimize_intrinsics": False}, "min_angle_deg": 1.0,
                        }
                    ]
                },
            },
            indent=2,
        )
    )

    # --- line-scan input ----------------------------------------------------
    plane_n = np.array([0.1, -0.85, 0.52])
    plane_n /= np.linalg.norm(plane_n)
    plane_d = -0.45
    views = []
    for k in range(3):
        pose = view_pose(k, 6)
        r, t = pose[:3, :3], pose[:3, 3]
        uv = render(intr, pose)
        a = plane_n @ r[:, 0]
        b = plane_n @ r[:, 1]
        c = plane_n @ t + plane_d
        xs_l = np.linspace(-0.12, 0.12, 25)
        ys_l = (-c - a * xs_l) / b
        pts_t = np.stack([xs_l, ys_l, np.zeros_like(xs_l)], -1)
        pc = pts_t @ r.T + t
        laser_uv = np.asarray(pinhole.project(jnp.asarray(intr), jnp.asarray(pc)))
        views.append(
            {
                "target_view": [
                    {"object_xy": obj[j].tolist(), "image_uv": uv[j].tolist()}
                    for j in range(n)
                ],
                "laser_uv": laser_uv.tolist(),
            }
        )
    (out / "linescan_input.json").write_text(
        json.dumps(
            {
                "camera": {
                    "kmtx": {"fx": kmtx[0], "fy": kmtx[1], "cx": kmtx[2], "cy": kmtx[3],
                             "skew": kmtx[4]},
                    "distortion": {"coeffs": dist.tolist()},
                },
                "views": views,
                "plane_fit": {"method": "svd"},
            },
            indent=2,
        )
    )
    print(f"wrote examples to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
