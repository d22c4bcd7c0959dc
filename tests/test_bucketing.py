"""Shape-bucketing invariance: padding views/points with masked data and
frozen pose blocks must not change the solution."""

import numpy as np
import jax.numpy as jnp

import synth
from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions, optimize_intrinsics
from calibration_tpu.pipeline.planar_utils import bucket_points, bucket_views

OPTS = IntrinsicsOptimOptions(core=OptimOptions(max_iterations=60, compute_covariance=False))


def test_bucket_helpers():
    assert bucket_views(5) == 6
    assert bucket_views(8) == 8
    assert bucket_views(70) == 80
    assert bucket_points(88) == 96
    assert bucket_points(1) == 32


def test_padded_solve_matches_unpadded():
    intr_gt = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.05)  # 35 points
    poses = synth.circle_views(6)
    uv = synth.render_pixels(intr_gt, poses, obj)
    obj_b = np.tile(obj[None], (6, 1, 1))

    intr0 = intr_gt.copy()
    intr0[:4] += [5.0, -3.0, 2.0, -2.0]

    res_plain = optimize_intrinsics(obj_b, uv, intr0, poses, opts=OPTS)

    v_pad, n_pad = 8, 64
    obj_p = np.zeros((v_pad, n_pad, 2))
    uv_p = np.zeros((v_pad, n_pad, 2))
    mask_p = np.zeros((v_pad, n_pad))
    obj_p[:6, :35] = obj_b
    uv_p[:6, :35] = uv
    mask_p[:6, :35] = 1.0
    poses_p = np.tile(np.eye(4), (v_pad, 1, 1))
    poses_p[:, 2, 3] = 1.0
    poses_p[:6] = poses
    view_valid = np.arange(v_pad) < 6

    res_pad = optimize_intrinsics(
        obj_p, uv_p, intr0, poses_p, mask=jnp.asarray(mask_p), opts=OPTS,
        view_valid=jnp.asarray(view_valid),
    )
    assert res_pad.core.success
    np.testing.assert_allclose(res_pad.camera, res_plain.camera, atol=1e-8)
    np.testing.assert_allclose(res_pad.c_se3_t[:6], res_plain.c_se3_t, atol=1e-7)
    # frozen padded poses unchanged
    np.testing.assert_allclose(res_pad.c_se3_t[6:], poses_p[6:], atol=1e-12)
