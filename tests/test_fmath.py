"""Accuracy and derivative tests for ops/fmath.py.

The values are checked against numpy's f64 libm on a spread of arguments
covering every reduction interval; the derivatives are checked against the
closed forms because each public function carries an exact jax.custom_jvp
rule (without it, jacfwd differentiates the argument-reduction/polynomial
chain term by term — the dominant cost of the transcendental-bound solvers;
see fmath.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calibration_tpu.ops import fmath

XS = np.array(
    [-7.1, -3.5, -1.5707963267948966, -1.0, -1e-3, 0.0, 1e-9, 0.3,
     0.7853981633974483, 1.2, 2.9, 6.0, 55.0, -123.456]
)


def test_sin_cos_values():
    s = np.asarray(jax.jit(fmath.sin)(jnp.asarray(XS)))
    c = np.asarray(jax.jit(fmath.cos)(jnp.asarray(XS)))
    np.testing.assert_allclose(s, np.sin(XS), rtol=0, atol=4e-16)
    np.testing.assert_allclose(c, np.cos(XS), rtol=0, atol=4e-16)


def test_sincos_matches_sin_cos():
    # 1-ulp tolerance: jit fusion may reorder rounding vs the eager chain
    s, c = jax.jit(fmath.sincos)(jnp.asarray(XS))
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(fmath.sin(jnp.asarray(XS))), rtol=0, atol=3e-16
    )
    np.testing.assert_allclose(
        np.asarray(c), np.asarray(fmath.cos(jnp.asarray(XS))), rtol=0, atol=3e-16
    )


def test_atan_atan2_values():
    a = np.asarray(jax.jit(fmath.atan)(jnp.asarray(XS)))
    np.testing.assert_allclose(a, np.arctan(XS), rtol=0, atol=4e-16)
    ys = np.array([0.5, -2.0, 1.0, 3.0, -0.1, 0.0, 2.0, -4.0, 0.0])
    xs = np.array([1.5, 0.7, -1.0, -2.0, 0.9, 1.0, -3.0, 0.2, -2.0])
    a2 = np.asarray(jax.jit(fmath.atan2)(jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(a2, np.arctan2(ys, xs), rtol=0, atol=8e-16)


def test_asin_acos_values():
    xs = np.array([-1.0, -0.99, -0.5, 0.0, 0.3, 0.99, 1.0])
    np.testing.assert_allclose(
        np.asarray(fmath.asin(jnp.asarray(xs))), np.arcsin(xs), rtol=0, atol=8e-16
    )
    np.testing.assert_allclose(
        np.asarray(fmath.acos(jnp.asarray(xs))), np.arccos(xs), rtol=0, atol=8e-16
    )


@pytest.mark.parametrize(
    "fn,dref",
    [
        (fmath.sin, np.cos),
        (fmath.cos, lambda x: -np.sin(x)),
        (fmath.atan, lambda x: 1.0 / (1.0 + x * x)),
    ],
)
def test_custom_jvp_exact(fn, dref):
    g = np.asarray(jax.vmap(jax.grad(fn))(jnp.asarray(XS)))
    np.testing.assert_allclose(g, dref(XS), rtol=0, atol=4e-16)


def test_sincos_jvp_exact():
    _, (ds, dc) = jax.jvp(
        fmath.sincos, (jnp.asarray(XS),), (jnp.ones_like(jnp.asarray(XS)),)
    )
    np.testing.assert_allclose(np.asarray(ds), np.cos(XS), rtol=0, atol=4e-16)
    np.testing.assert_allclose(np.asarray(dc), -np.sin(XS), rtol=0, atol=4e-16)


def test_atan2_grads_both_args():
    ys = np.array([0.5, -2.0, 1.0, 3.0, -0.1, 0.0, 2.0, -4.0])
    xs = np.array([1.5, 0.7, -1.0, -2.0, 0.9, 1.0, -3.0, 0.2])
    gy = np.asarray(jax.vmap(jax.grad(fmath.atan2, argnums=0))(jnp.asarray(ys), jnp.asarray(xs)))
    gx = np.asarray(jax.vmap(jax.grad(fmath.atan2, argnums=1))(jnp.asarray(ys), jnp.asarray(xs)))
    r2 = xs * xs + ys * ys
    np.testing.assert_allclose(gy, xs / r2, rtol=0, atol=4e-16)
    np.testing.assert_allclose(gx, -ys / r2, rtol=0, atol=4e-16)


def test_atan2_grad_origin_finite():
    # primal pins atan2(0, 0) = 0; the JVP rule pins the tangent to 0 there
    # instead of 0/0 = NaN (masked rows in padded pose batches hit this).
    g = jax.grad(fmath.atan2, argnums=0)(jnp.asarray(0.0), jnp.asarray(0.0))
    assert float(g) == 0.0


def test_second_derivatives_flow():
    # the custom rules are themselves differentiable (covariance paths may
    # nest jacfwd); d2 sin = -sin
    h = jax.grad(jax.grad(fmath.sin))(jnp.asarray(0.7))
    np.testing.assert_allclose(float(h), -np.sin(0.7), rtol=0, atol=4e-16)


def test_asin_grad_through_chain():
    xs = np.array([-0.9, -0.3, 0.0, 0.5, 0.99])
    g = np.asarray(jax.vmap(jax.grad(fmath.asin))(jnp.asarray(xs)))
    np.testing.assert_allclose(g, 1.0 / np.sqrt(1.0 - xs * xs), rtol=1e-13, atol=0)


def test_f32_fallback_native():
    xs32 = jnp.asarray(XS, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fmath.sin(xs32)), np.asarray(jnp.sin(xs32))
    )
    g = jax.grad(fmath.sin)(jnp.float32(0.5))
    np.testing.assert_allclose(float(g), np.cos(0.5), rtol=1e-6)
