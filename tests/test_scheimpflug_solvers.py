"""Scheimpflug-camera solver tests (reference:
tests/unit/scheimpflug_bundle_test.cpp: intrinsics-with-fixed-handeye and
handeye-with-fixed-intrinsics recovery)."""

import numpy as np
import jax.numpy as jnp
import pytest

import synth
from calibration_tpu.models import SCHEIMPFLUG, pinhole, scheimpflug
from calibration_tpu.optim import (
    BundleOptions,
    IntrinsicsOptimOptions,
    OptimOptions,
    optimize_bundle,
    optimize_intrinsics,
)
from calibration_tpu.ops import se3


def _scheimpflug_camera():
    intr10 = pinhole.pack(
        jnp.asarray([600.0, 610.0, 320.0, 240.0, 0.0]),
        jnp.asarray([-0.1, 0.03, 0.0, 1e-4, -5e-5]),
    )
    return np.asarray(scheimpflug.pack(intr10, 0.06, -0.04))


def _render(intr12, poses, obj):
    obj3 = jnp.concatenate([jnp.asarray(obj), jnp.zeros((obj.shape[0], 1))], -1)
    pts_c = se3.se3_apply(jnp.asarray(poses)[:, None], obj3[None])
    return np.asarray(scheimpflug.project(jnp.asarray(intr12), pts_c))


def test_scheimpflug_intrinsics_recovery():
    intr_gt = _scheimpflug_camera()
    obj = synth.make_target_grid(6, 8, 0.04)
    poses = synth.circle_views(8)
    uv = _render(intr_gt, poses, obj)
    obj_b = np.tile(obj[None], (8, 1, 1))

    intr0 = intr_gt.copy()
    intr0[:4] += [5.0, -4.0, 3.0, -2.0]
    intr0[10:] += [0.01, -0.01]  # perturb tilts
    res = optimize_intrinsics(
        obj_b, uv, intr0, poses, model=SCHEIMPFLUG,
        opts=IntrinsicsOptimOptions(core=OptimOptions(compute_covariance=False)),
    )
    assert res.core.success
    np.testing.assert_allclose(res.camera[:4], intr_gt[:4], atol=1e-5)
    np.testing.assert_allclose(res.camera[10:], intr_gt[10:], atol=1e-6)


def test_scheimpflug_bundle_handeye_recovery():
    # hand-eye with fixed intrinsics (scheimpflug_bundle_test.cpp:13-58)
    intr_gt = _scheimpflug_camera()
    obj = synth.make_target_grid(8, 11, 0.03)
    sim = synth.make_handeye_sequence(num_poses=15)
    uv = _render(intr_gt, sim["c_se3_t"], obj)
    o = uv.shape[0]
    obj_b = np.tile(obj[None], (o, 1, 1))

    g0 = synth.euler_pose(0.11, -0.21, 0.16, [0.021, -0.031, 0.051])
    b0 = synth.euler_pose(0.055, 0.025, -0.075, [0.405, -0.095, 0.195])
    res = optimize_bundle(
        obj_b, uv, sim["b_se3_g"], np.zeros(o, int), intr_gt[None], g0[None], b0,
        model=SCHEIMPFLUG,
        opts=BundleOptions(core=OptimOptions(compute_covariance=False)),
    )
    assert res.core.success
    assert synth.rot_err_deg(res.g_se3_c[0], sim["g_se3_c"]) < 1e-5
    assert synth.trans_err(res.g_se3_c[0], sim["g_se3_c"]) < 1e-6


def test_fixed_distortion_indices_full_solver():
    """fixed_distortion_indices now reaches the FULL intrinsics solver (the
    reference declares the fields, intrinsics.h:18-19, but only its semidlt
    path reads them): fixed coefficients land exactly at the assigned values
    and the tilt/tangential degeneracy disappears — a Scheimpflug solve with
    free p1/p2 wanders the cost-flat tau~p1/p2 valley (measured 10-58
    linearizations vs pinhole's 5-6); with p1=p2 fixed at 0 on the
    reference's own zero-tangential camera (scheimpflug_test.cpp:17-18) it
    converges pinhole-fast and recovers the tilt."""
    intr_gt = _scheimpflug_camera().copy()
    intr_gt[8:10] = 0.0  # zero-tangential camera: tilt identifiable
    obj = synth.make_target_grid(6, 8, 0.04)
    poses = synth.circle_views(8)
    uv = _render(intr_gt, poses, obj)
    obj_b = np.tile(obj[None], (8, 1, 1))

    intr0 = intr_gt.copy()
    intr0[:4] += [5.0, -4.0, 3.0, -2.0]
    intr0[8:10] = [1e-3, -1e-3]  # seed overwritten by the fixed values
    intr0[10:] += [0.01, -0.01]
    res = optimize_intrinsics(
        obj_b, uv, intr0, poses, model=SCHEIMPFLUG,
        opts=IntrinsicsOptimOptions(
            core=OptimOptions(compute_covariance=False),
            # reference [k1..k_nr, p1, p2] semantics (num_radial=2): indices
            # 2, 3 are p1, p2 — same meaning as in semidlt/fit_distortion_full
            fixed_distortion_indices=(2, 3),
            fixed_distortion_values=(0.0, 0.0),
        ),
    )
    assert res.core.success
    # fixed coefficients are EXACT (frozen, not just converged)
    np.testing.assert_array_equal(res.camera[8:10], [0.0, 0.0])
    np.testing.assert_allclose(res.camera[:4], intr_gt[:4], atol=1e-5)
    np.testing.assert_allclose(res.camera[10:], intr_gt[10:], atol=1e-6)
    # convergence is pinhole-class again, not a valley crawl
    assert res.core.iterations <= 15


@pytest.mark.parametrize("bad_idx", [-1, 4, 5])
def test_fixed_distortion_index_out_of_range(bad_idx):
    """The full solver validates indices against [k1..k_nr, p1, p2] just like
    semidlt._fixed_arrays (num_radial=2 -> valid range [0, 3]); out-of-range
    previously froze unrelated ambient slots (quat components / tilts)
    silently."""
    intr_gt = _scheimpflug_camera()
    obj = synth.make_target_grid(4, 5, 0.04)
    poses = synth.circle_views(4)
    uv = _render(intr_gt, poses, obj)
    obj_b = np.tile(obj[None], (4, 1, 1))
    with pytest.raises(ValueError, match="out of range"):
        optimize_intrinsics(
            obj_b, uv, intr_gt, poses, model=SCHEIMPFLUG,
            opts=IntrinsicsOptimOptions(
                core=OptimOptions(compute_covariance=False),
                fixed_distortion_indices=(bad_idx,),
            ),
        )
