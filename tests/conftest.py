"""Test harness: force CPU backend with an 8-device virtual mesh so sharding
tests run without TPU hardware, and double precision for parity asserts
(mirrors the reference's CPU/double GoogleTest suite, SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: the suite is dominated by many small XLA
# compiles; caching them makes re-runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    """Seeded generator mirroring the reference's deterministic fixtures
    (tests/unit/utils.h:163-181, seed 0xC001C0DE)."""
    return np.random.default_rng(0xC001C0DE)
