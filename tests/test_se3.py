"""SE(3)/SO(3) utility tests (reference: tests/unit/se3_utils_test.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

import synth
from calibration_tpu.ops import se3


def test_exp_log_roundtrip():
    w = jnp.array([[0.3, -0.2, 0.5], [1e-14, 0, 0], [0, 0, 0], [2.5, 1.0, -0.7]])
    r = se3.exp_so3(w)
    w2 = se3.log_so3(r)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-10)


def test_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * (np.pi - 1e-7))
    r = se3.exp_so3(w)
    w2 = se3.log_so3(r)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)


def test_project_to_so3():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(3, 3))
    r = np.asarray(se3.project_to_so3(jnp.asarray(m)))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(r) > 0


def test_quat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        w = rng.normal(size=3)
        r = se3.exp_so3(jnp.asarray(w))
        q = se3.rotmat_to_quat(r)
        r2 = se3.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-12)


def test_se3_inverse_compose():
    w = jnp.array([0.2, 0.3, -0.1, 0.5, -0.4, 1.2])
    m = se3.se3_exp(w)
    ident = np.asarray(m @ se3.se3_inverse(m))
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-12)


def test_average_isometries():
    base = se3.se3_exp(jnp.array([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]))
    poses = jnp.stack([base, base, base])
    avg = se3.average_isometries(poses)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(base), atol=1e-12)


def test_average_isometries_masked():
    a = se3.se3_exp(jnp.array([0.1, 0.0, 0.0, 1.0, 0.0, 0.0]))
    junk = se3.se3_exp(jnp.array([2.0, 1.0, -1.0, 9.0, 9.0, 9.0]))
    poses = jnp.stack([a, junk, a])
    avg = se3.average_isometries(poses, jnp.array([1.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(avg), np.asarray(a), atol=1e-12)


def test_log_so3_grad_at_identity():
    # AX=XB residuals differentiate log at ~identity; must be NaN-free.
    def f(w):
        return se3.log_so3(se3.exp_so3(w))

    j = jax.jacfwd(f)(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(j), np.eye(3), atol=1e-8)


def test_average_isometries_masked_nan_proof():
    """A masked-out pose may be NaN (degenerate padded view); the average
    must select through the mask, not weight-multiply (NaN * 0 = NaN)."""
    poses = np.stack([synth.euler_pose(0.1, 0.2, -0.1, [1, 2, 3]) for _ in range(3)])
    poses[2] = np.nan
    mask = jnp.asarray([1.0, 1.0, 0.0])
    avg = np.asarray(se3.average_isometries(jnp.asarray(poses), mask))
    assert np.all(np.isfinite(avg))
    np.testing.assert_allclose(avg, poses[0], atol=1e-12)
