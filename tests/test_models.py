"""Camera model tests (reference: tests/unit/distortion_test.cpp,
scheimpflug tests, camera matrix round trips)."""

import numpy as np
import jax.numpy as jnp

from calibration_tpu.models import camera_matrix as cm
from calibration_tpu.models import distortion as dist
from calibration_tpu.models import pinhole, scheimpflug


K = jnp.array([600.0, 620.0, 320.0, 240.0, 0.5])
COEFFS = jnp.array([-0.2, 0.05, 1e-4, -2e-4])  # k1,k2,p1,p2


def test_normalize_denormalize_roundtrip():
    uv = jnp.array([[10.0, 20.0], [300.0, 200.0], [639.0, 479.0]])
    xy = cm.normalize(K, uv)
    uv2 = cm.denormalize(K, xy)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-12)


def test_distort_undistort_roundtrip():
    xy = jnp.array([[0.1, -0.2], [0.3, 0.25], [0.0, 0.0]])
    d = dist.apply_distortion(xy, COEFFS)
    u = dist.undistort(d, COEFFS)
    np.testing.assert_allclose(np.asarray(u), np.asarray(xy), atol=1e-6)


def test_fit_distortion_exact():
    # exact-fit recovery (distortion_test.cpp:62-90)
    rng = np.random.default_rng(3)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, (40, 2)))
    uv = cm.denormalize(K, dist.apply_distortion(xy, COEFFS))
    coeffs, res, ok = dist.fit_distortion_full(xy, uv, K, num_radial=2)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(coeffs), np.asarray(COEFFS), atol=1e-10)
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_fit_distortion_fixed_coefficients():
    # pinning coefficients (distortion_test.cpp fixed-coeff scenarios)
    rng = np.random.default_rng(4)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, (50, 2)))
    uv = cm.denormalize(K, dist.apply_distortion(xy, COEFFS))
    fixed_mask = jnp.array([True, False, False, False])
    fixed_values = jnp.array([-0.2, 0.0, 0.0, 0.0])
    coeffs, _, ok = dist.fit_distortion_full(
        xy, uv, K, num_radial=2, fixed_mask=fixed_mask, fixed_values=fixed_values
    )
    assert bool(ok)
    # the pin is a final jnp.where, but XLA may rewrite select into
    # arithmetic (observed 1-ulp drift across compiler versions) — assert
    # to ulp-level tolerance, not bitwise equality
    assert abs(float(coeffs[0]) - (-0.2)) < 1e-15
    np.testing.assert_allclose(np.asarray(coeffs), np.asarray(COEFFS), atol=1e-9)


def test_fit_distortion_insufficient():
    xy = jnp.zeros((5, 2))
    uv = jnp.zeros((5, 2))
    _, _, ok = dist.fit_distortion_full(xy, uv, K, num_radial=2)
    assert not bool(ok)


def test_fit_distortion_masked_matches_subset():
    rng = np.random.default_rng(5)
    xy = np.asarray(rng.uniform(-0.4, 0.4, (30, 2)))
    uv = np.array(cm.denormalize(K, dist.apply_distortion(jnp.asarray(xy), COEFFS)))
    uv += rng.normal(0, 0.05, uv.shape)
    mask = np.ones(30, bool)
    mask[20:] = False
    c_masked, _, _ = dist.fit_distortion_full(jnp.asarray(xy), jnp.asarray(uv), K, 2, mask=jnp.asarray(mask))
    c_subset, _, _ = dist.fit_distortion_full(jnp.asarray(xy[:20]), jnp.asarray(uv[:20]), K, 2)
    np.testing.assert_allclose(np.asarray(c_masked), np.asarray(c_subset), atol=1e-9)


def test_dual_distortion_inverse():
    # invert_brown_conrady grid fit (distortion_test.cpp dual model)
    inv = dist.invert_brown_conrady(COEFFS)
    xy = jnp.array([[0.2, 0.1], [-0.3, 0.2], [0.05, -0.35]])
    d = dist.apply_distortion(xy, COEFFS)
    u = dist.apply_distortion(d, inv)
    np.testing.assert_allclose(np.asarray(u), np.asarray(xy), atol=5e-3)


def test_pinhole_project_unproject():
    intr = pinhole.pack(K, COEFFS)
    assert intr.shape == (10,)
    xyz = jnp.array([[0.1, 0.2, 1.0], [-0.2, 0.15, 2.0]])
    uv = pinhole.project(intr, xyz)
    xy = pinhole.unproject(intr, uv)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(xyz[:, :2] / xyz[:, 2:]), atol=1e-7)


def test_scheimpflug_zero_tilt_matches_pinhole():
    intr10 = pinhole.pack(K, COEFFS)
    intr12 = scheimpflug.pack(intr10, 0.0, 0.0)
    xyz = jnp.array([[0.1, 0.2, 1.0], [-0.25, 0.12, 1.7]])
    np.testing.assert_allclose(
        np.asarray(scheimpflug.project(intr12, xyz)),
        np.asarray(pinhole.project(intr10, xyz)),
        atol=1e-10,
    )


def test_scheimpflug_project_unproject_roundtrip():
    intr10 = pinhole.pack(K, COEFFS)
    intr12 = scheimpflug.pack(intr10, 0.08, -0.05)
    xyz = jnp.array([[0.1, 0.2, 1.0], [-0.15, 0.05, 1.5]])
    uv = scheimpflug.project(intr12, xyz)
    mxy = scheimpflug.unproject(intr12, uv)
    # unproject returns tilted-plane coords; re-project the corresponding ray
    ray = scheimpflug.plane_point_to_ray(intr12, mxy)
    uv2 = scheimpflug.project(intr12, ray)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-6)


def test_sanitize_intrinsics():
    bad = jnp.array([-5.0, jnp.nan, 5000.0, 300.0, 0.5])
    fixed, mod = cm.sanitize_intrinsics(bad, cm.CalibrationBounds())
    assert bool(mod)
    f = np.asarray(fixed)
    assert f[0] == 0.0 and f[1] == 0.0
    assert f[2] == 640.0  # midpoint of [0, 1280]
    assert f[3] == 300.0
    assert f[4] == 0.01 or f[4] == 0.0  # clamped skew
