"""Unit tests mirroring reference suites that had no direct analogue here:
tests/unit/stream_capture_test.cpp and tests/unit/linescan_utils_test.cpp.
"""

import sys

import numpy as np
import jax.numpy as jnp

from calibration_tpu.io.stream_capture import StreamCapture, WarningCollector
from calibration_tpu.ops import linescan, planefit
from calibration_tpu.ops.linalg import inv3


def test_stream_capture_captures_and_restores():
    """stream_capture_test.cpp::CapturesAndRestoresStreamBuffer."""
    old = sys.stderr
    with StreamCapture("stderr") as cap:
        print("hello", "world", file=sys.stderr, end="")
        assert cap.str() == "hello world"
    assert sys.stderr is old
    # post-exit writes go to the restored stream, not the buffer
    assert cap.str() == "hello world"


def test_warning_collector_counts():
    wc = WarningCollector()
    wc.warn("invalid K matrix in view 3")
    wc.warn("pose decomposition failed")
    wc.warn("invalid K matrix in view 7")
    assert len(wc) == 3
    assert wc.count_containing("invalid K") == 2
    assert wc.count_containing("pose") == 1
    assert wc.count_containing("nothing") == 0


def test_build_plane_homography_basis_lies_on_plane():
    """linescan.h:49-61: the inverse of the returned homography is the plane
    basis [e1 e2 p0] — e1, e2 orthonormal in the plane, p0 the foot point."""
    for plane in (
        np.array([0.0, 0.0, 1.0, -0.5]),
        np.array([0.6, 0.0, 0.8, 0.3]),
        np.array([1.0, 0.0, 0.0, -1.2]),  # exercises the |n_z| >= 0.9 branch
    ):
        hm = np.asarray(linescan.build_plane_homography(jnp.asarray(plane)))
        basis = np.asarray(inv3(jnp.asarray(hm)))  # [e1 e2 p0]
        n, d = plane[:3], plane[3]
        e1, e2, p0 = basis[:, 0], basis[:, 1], basis[:, 2]
        assert abs(n @ e1) < 1e-12
        assert abs(n @ e2) < 1e-12
        np.testing.assert_allclose(n @ p0 + d, 0.0, atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(e1), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(e2), 1.0, atol=1e-12)
        assert abs(e1 @ e2) < 1e-12
        # any plane coordinate maps to a 3D point on the plane
        for ab in ([0.0, 0.0], [1.0, -2.0], [0.3, 0.7]):
            p = basis @ np.array([*ab, 1.0])
            np.testing.assert_allclose(n @ p + d, 0.0, atol=1e-10)


def test_points_from_view_lifts_laser_pixels_exactly():
    """linescan_utils_test.cpp::PointsFromViewProduces3DPoints, strengthened:
    with an exact synthetic view the lifted points must land ON the target
    plane in the camera frame, not just have the right count."""
    rng = np.random.default_rng(3)
    # ground-truth planar pose (camera looking at z=0 target plane)
    from calibration_tpu.ops import se3

    w = np.array([0.15, -0.1, 0.05])
    t = np.array([0.02, -0.03, 0.9])
    rot = np.asarray(se3.exp_so3(jnp.asarray(w)))
    n_pts = 16
    obj_xy = rng.uniform(-0.3, 0.3, (n_pts, 2))
    obj3 = np.concatenate([obj_xy, np.zeros((n_pts, 1))], -1)
    cam_pts = obj3 @ rot.T + t
    target_norm = cam_pts[:, :2] / cam_pts[:, 2:3]

    laser_obj = rng.uniform(-0.25, 0.25, (7, 2))
    laser3 = np.concatenate([laser_obj, np.zeros((7, 1))], -1)
    laser_cam = laser3 @ rot.T + t
    laser_norm = laser_cam[:, :2] / laser_cam[:, 2:3]

    pts, ok = linescan.points_from_view(
        jnp.asarray(obj_xy), jnp.asarray(target_norm), jnp.asarray(laser_norm)
    )
    pts = np.asarray(pts)
    assert bool(ok)
    assert pts.shape == (7, 3)
    np.testing.assert_allclose(pts, laser_cam, atol=1e-9)


def test_fit_plane_svd_exact_plane_and_zero_rms():
    """linescan_utils_test.cpp::FitPlaneSVDDetectsPlane / PlaneRMSZeroFor..."""
    ii, jj = np.meshgrid(np.arange(5.0), np.arange(5.0), indexing="ij")
    pts = np.stack([ii.ravel(), jj.ravel(), np.zeros(25)], -1)
    plane = np.asarray(planefit.fit_plane_svd(jnp.asarray(pts)))
    # sign-normalize: n_z > 0
    plane = plane * np.sign(plane[2])
    np.testing.assert_allclose(plane, [0.0, 0.0, 1.0, 0.0], atol=1e-12)
    rms = float(planefit.plane_rms(jnp.asarray(plane), jnp.asarray(pts)))
    assert rms < 1e-12
