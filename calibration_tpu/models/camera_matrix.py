"""5-parameter intrinsic camera matrix ops (reference:
include/calib/models/camera_matrix.h).

An intrinsic matrix is a flat ``(..., 5)`` array ``[fx, fy, cx, cy, skew]`` —
array-first instead of the reference's aggregate struct so that whole batches
of cameras live in one device array.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

IDX_FX, IDX_FY, IDX_CX, IDX_CY, IDX_SKEW = 0, 1, 2, 3, 4


def matrix(k):
    """(...,5) -> (...,3,3) upper-triangular K (camera_matrix.h:22-31)."""
    fx, fy, cx, cy, skew = (k[..., i] for i in range(5))
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, skew, cx], -1),
            jnp.stack([z, fy, cy], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def from_matrix(m):
    """(...,3,3) -> (...,5)."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 1, 1], m[..., 0, 2], m[..., 1, 2], m[..., 0, 1]], axis=-1
    )


def normalize(k, pixel):
    """Pixel -> normalized coordinates (camera_matrix.h:33-39).

    k: (..., 5); pixel: (..., 2). Broadcasts over batch dims.
    """
    y = (pixel[..., 1] - k[..., 3]) / k[..., 1]
    x = (pixel[..., 0] - k[..., 2] - k[..., 4] * y) / k[..., 0]
    return jnp.stack([x, y], axis=-1)


def denormalize(k, xy):
    """Normalized -> pixel coordinates (camera_matrix.h:41-46)."""
    u = k[..., 0] * xy[..., 0] + k[..., 4] * xy[..., 1] + k[..., 2]
    v = k[..., 1] * xy[..., 1] + k[..., 3]
    return jnp.stack([u, v], axis=-1)


@dataclasses.dataclass(frozen=True)
class CalibrationBounds:
    """Default parameter box (camera_matrix.h:50-72)."""

    fx_min: float = 0.0
    fx_max: float = 2000.0
    fy_min: float = 0.0
    fy_max: float = 2000.0
    cx_min: float = 0.0
    cx_max: float = 1280.0
    cy_min: float = 0.0
    cy_max: float = 720.0
    skew_min: float = -0.01
    skew_max: float = 0.01

    def lower(self):
        return jnp.array([self.fx_min, self.fy_min, self.cx_min, self.cy_min, self.skew_min])

    def upper(self):
        return jnp.array([self.fx_max, self.fy_max, self.cx_max, self.cy_max, self.skew_max])


def sanitize_intrinsics(k, bounds: CalibrationBounds | None):
    """Clamp/repair K against bounds (reference:
    include/calib/estimation/common/intrinsics_utils.h:12-68).

    Returns (sanitized_k, modified_flag). Non-finite or out-of-box principal
    points snap to the box midpoint; focals below the minimum snap to it.
    """
    if bounds is None:
        return k, jnp.zeros(k.shape[:-1], bool)

    fx, fy, cx, cy, skew = (k[..., i] for i in range(5))

    def fix_focal(v, lo):
        bad = ~jnp.isfinite(v) | (v < lo)
        return jnp.where(bad, lo, v), bad

    def fix_pp(v, lo, hi):
        mid = 0.5 * (lo + hi)
        bad = ~jnp.isfinite(v) | (v < lo) | (v > hi)
        return jnp.where(bad, mid, v), bad

    fx2, b1 = fix_focal(fx, bounds.fx_min)
    fy2, b2 = fix_focal(fy, bounds.fy_min)
    cx2, b3 = fix_pp(cx, bounds.cx_min, bounds.cx_max)
    cy2, b4 = fix_pp(cy, bounds.cy_min, bounds.cy_max)
    s_lo = min(bounds.skew_min, bounds.skew_max)
    s_hi = max(bounds.skew_min, bounds.skew_max)
    bad_s = ~jnp.isfinite(skew) | (skew < s_lo) | (skew > s_hi)
    skew2 = jnp.where(bad_s, jnp.clip(0.0, s_lo, s_hi), skew)
    out = jnp.stack([fx2, fy2, cx2, cy2, skew2], axis=-1)
    return out, b1 | b2 | b3 | b4 | bad_s
