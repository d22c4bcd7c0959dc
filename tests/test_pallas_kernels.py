"""Fused projection-residual kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

import synth
from calibration_tpu.ops import pallas_kernels as pk
from calibration_tpu.ops import se3


def _problem(r=5, n=37, seed=2):
    rng = np.random.default_rng(seed)
    intr = np.tile(synth.default_camera()[None], (r, 1))
    intr[:, 0] += rng.normal(0, 5, r)
    rot = np.zeros((r, 3, 3))
    tra = np.zeros((r, 3))
    for i in range(r):
        w = rng.normal(0, 0.2, 3)
        rot[i] = np.asarray(se3.exp_so3(jnp.asarray(w)))
        tra[i] = rng.normal(0, 0.05, 3) + [0, 0, 1.0]
    obj = rng.uniform(-0.15, 0.15, (r, n, 2))
    uv = rng.uniform(0, 640, (r, n, 2))
    mask = rng.uniform(size=(r, n)) > 0.2
    return rot, tra, intr, obj, uv, mask


def test_pallas_matches_xla_interpret():
    rot, tra, intr, obj, uv, mask = _problem()
    ref = np.asarray(
        pk.projection_residuals_xla(
            jnp.asarray(rot, jnp.float32), jnp.asarray(tra, jnp.float32),
            jnp.asarray(intr, jnp.float32), jnp.asarray(obj, jnp.float32),
            jnp.asarray(uv, jnp.float32), jnp.asarray(mask, jnp.float32),
        )
    )
    got = np.asarray(
        pk.projection_residuals_f32(
            jnp.asarray(rot), jnp.asarray(tra), jnp.asarray(intr),
            jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(mask), interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)  # f32 pixel-scale tolerance
    # masked slots exactly zero
    assert np.all(got[~mask] == 0.0)
