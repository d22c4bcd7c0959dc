"""calibration_tpu — a TPU-native camera-calibration framework.

A from-scratch JAX/XLA re-design of the capability surface of the reference
C++ library (``VitalyVorobyev/calibration``): camera/distortion models,
closed-form linear estimators (DLT homography, Zhang intrinsics, Tsai-Lenz
hand-eye, plane fits), a from-scratch batched Levenberg-Marquardt engine with
autodiff Jacobians replacing Ceres, vmapped RANSAC, and a JSON-driven
calibration pipeline with the same schemas and report formats.

Everything in ``ops``/``models``/``optim`` is pure-functional jnp code:
jit-able, vmap-able over problem batches, and shardable across a device mesh
(see ``calibration_tpu.parallel``). Double precision is enabled globally at
import because calibration parity targets are 1e-6-level parameter recovery
(reference: tests/unit/bundle_test.cpp).
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import io, models, ops, optim, parallel, utils  # noqa: E402,F401

# pipeline imports facades (heavier); exposed lazily
from . import pipeline  # noqa: E402,F401
