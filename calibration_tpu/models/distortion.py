"""Brown-Conrady lens distortion: forward/inverse maps and the linear
(variable-projection) coefficient fit (reference: include/calib/models/distortion.h).

Coefficients are ``[k1..kn, p1, p2]`` — n radial terms then two tangential
terms, matching the reference ordering (distortion.h:80-82). The coefficient
count is static (shape-derived), so everything jits and vmaps.

The linear fit is the inner solve of the reference's variable-projection
residuals (distortion.h:229-363); here it is a masked, fixed-shape normal
-equation solve so it can (a) run batched and (b) be differentiated through
by the LM engine (SVD-based lstsq has unstable JVPs near degeneracy; the
ridge-stabilised Cholesky form is smooth).
"""

from __future__ import annotations

import jax.numpy as jnp


def _spd_solve(a, b):
    # Cholesky solve: TPU f64 has no LU expander (ops/linalg.py rationale);
    # local copy avoids a models -> ops import cycle.
    from jax.scipy.linalg import cho_solve

    low = jnp.linalg.cholesky(a)
    return cho_solve((low, True), b)

MIN_FIT_OBSERVATIONS = 8  # distortion.h:236
UNDISTORT_ITERS = 5  # distortion.h:127


def apply_distortion(xy, coeffs):
    """Forward Brown-Conrady distortion of normalized coords (distortion.h:91-116).

    xy: (..., 2); coeffs: (..., D) with D >= 2 and D-2 radial terms.
    """
    num_radial = coeffs.shape[-1] - 2
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = jnp.ones_like(r2)
    rpow = r2
    for i in range(num_radial):
        radial = radial + coeffs[..., i] * rpow
        rpow = rpow * r2
    p1 = coeffs[..., num_radial]
    p2 = coeffs[..., num_radial + 1]
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort(xy, coeffs, iters: int = UNDISTORT_ITERS):
    """Inverse distortion via fixed-point iteration (distortion.h:119-134).

    Matches the reference's fixed 5-iteration schedule for bit-consistent
    behavior; pass ``iters`` to trade accuracy for speed.
    """
    und = xy
    for _ in range(iters):
        und = und + (xy - apply_distortion(und, coeffs))
    return und


def _build_design(xy, uv, kmtx, num_radial):
    fx, fy, cx, cy, skew = (kmtx[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y

    und_u = fx * x + skew * y + cx
    und_v = fy * y + cy
    res_u = uv[..., 0] - und_u
    res_v = uv[..., 1] - und_v

    cols_u = []
    cols_v = []
    rpow = r2
    for _ in range(num_radial):
        cols_u.append(fx * x * rpow + skew * y * rpow)
        cols_v.append(fy * y * rpow)
        rpow = rpow * r2
    # tangential p1, p2
    cols_u.append(fx * (2.0 * x * y) + skew * (r2 + 2.0 * y * y))
    cols_v.append(fy * (r2 + 2.0 * y * y))
    cols_u.append(fx * (r2 + 2.0 * x * x) + skew * (2.0 * x * y))
    cols_v.append(fy * (2.0 * x * y))

    a_u = jnp.stack(cols_u, axis=-1)  # (N, D)
    a_v = jnp.stack(cols_v, axis=-1)  # (N, D)
    # interleave rows (u, v) per observation -> (2N, D)
    a = jnp.stack([a_u, a_v], axis=-2).reshape(xy.shape[:-2] + (2 * xy.shape[-2], num_radial + 2))
    b = jnp.stack([res_u, res_v], axis=-1).reshape(xy.shape[:-2] + (2 * xy.shape[-2],))
    return a, b


def fit_distortion_full(
    xy,
    uv,
    kmtx,
    num_radial: int = 2,
    mask=None,
    fixed_mask=None,
    fixed_values=None,
    ridge: float = 0.0,
):
    """Linear LSQ distortion fit (distortion.h:229-363), masked & batched.

    Args:
      xy: (N, 2) normalized undistorted coordinates.
      uv: (N, 2) observed distorted pixel coordinates.
      kmtx: (5,) intrinsics.
      num_radial: static radial coefficient count; D = num_radial + 2.
      mask: optional (N,) observation validity; masked rows are zeroed out of
        the system (exactly equivalent to dropping them).
      fixed_mask: optional (D,) bool — coefficients pinned to ``fixed_values``
        and eliminated from the solve, with the rhs adjusted
        (distortion.h:322-339).
      fixed_values: (D,) values for the pinned coefficients (default 0).
      ridge: Tikhonov damping for the normal equations (0 matches the
        reference's exact LSQ on well-posed systems).

    Returns:
      (coeffs (D,), residuals (2N,), ok) — residuals are ``A @ coeffs - b``
      with masked rows zero; ok is False when fewer than 8 valid observations.
    """
    n = xy.shape[-2]
    d = num_radial + 2
    a, b = _build_design(xy, uv, kmtx, num_radial)
    if mask is not None:
        m2 = jnp.repeat(mask.astype(a.dtype), 2, axis=-1)
        a = a * m2[..., :, None]
        b = b * m2
        count = jnp.sum(mask, axis=-1)
    else:
        count = jnp.asarray(n)

    if fixed_values is None:
        fixed_values = jnp.zeros((d,), a.dtype)
    if fixed_mask is None:
        fixed_mask = jnp.zeros((d,), bool)
    fixed_mask = jnp.asarray(fixed_mask)
    fixed_values = jnp.asarray(fixed_values, a.dtype) * fixed_mask

    b_adj = b - a @ fixed_values
    free = (~fixed_mask).astype(a.dtype)

    ata = a.T @ a if a.ndim == 2 else jnp.einsum("...ni,...nj->...ij", a, a)
    atb = a.T @ b_adj if a.ndim == 2 else jnp.einsum("...ni,...n->...i", a, b_adj)
    # Mask fixed rows/cols so pinned coefficients solve to exactly 0 delta.
    free_outer = free[..., :, None] * free[..., None, :]
    sys = ata * free_outer + jnp.diag(1.0 - free) + ridge * jnp.eye(d, dtype=a.dtype)
    rhs = atb * free
    alpha_free = _spd_solve(sys, rhs)
    alpha = jnp.where(fixed_mask, fixed_values, alpha_free)
    residuals = a @ alpha - b if a.ndim == 2 else jnp.einsum("...ij,...j->...i", a, alpha) - b
    ok = (count >= MIN_FIT_OBSERVATIONS) & jnp.all(jnp.isfinite(alpha), axis=-1)
    return alpha, residuals, ok


def fit_distortion(xy, uv, kmtx, num_radial: int = 2, **kw):
    """Alias matching the reference's `fit_distortion` (distortion.h:365-371)."""
    return fit_distortion_full(xy, uv, kmtx, num_radial, **kw)


def invert_brown_conrady(forward, num_samples: int = 21, lim: float = 1.0):
    """Fit inverse coefficients over a grid on [-lim, lim]^2 with identity K
    (distortion.h:165-195). ``forward``: (D,). Returns (D,) inverse coeffs."""
    d = forward.shape[-1]
    num_radial = d - 2
    g = jnp.linspace(-lim, lim, num_samples, dtype=forward.dtype)
    gx, gy = jnp.meshgrid(g, g, indexing="ij")
    und = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (G, 2)
    dst = apply_distortion(und, forward)
    kmtx = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0], forward.dtype)
    # observations: x,y = distorted; u,v = undistorted (swap, distortion.h:186)
    coeffs, _, ok = fit_distortion_full(dst, und, kmtx, num_radial)
    return jnp.where(ok, coeffs, jnp.zeros_like(coeffs))


def fit_distortion_dual(xy, uv, kmtx, num_radial: int = 2, mask=None, **kw):
    """Fit forward and inverse coefficient sets from data (distortion.h:373-405).

    Returns (forward, inverse, forward_residuals, ok).
    """
    fwd, res, ok_f = fit_distortion_full(xy, uv, kmtx, num_radial, mask=mask, **kw)
    from ..models import camera_matrix as cm

    xy_dist = cm.normalize(kmtx, uv)
    uv_undist = cm.denormalize(kmtx, xy)
    inv, _, ok_i = fit_distortion_full(xy_dist, uv_undist, kmtx, num_radial, mask=mask, **kw)
    return fwd, inv, res, ok_f & ok_i
