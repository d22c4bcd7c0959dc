"""Linear intrinsics estimation: Zhang seed pipeline and the normalized-obs
LSQ variants (reference: src/estimation/linear/intrinsicsdlt.cpp).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from . import linalg

from ..models import camera_matrix as cm
from ..models import distortion as dist
from . import homography as H
from . import planarpose, zhang


class IntrinsicsEstimate(NamedTuple):
    kmtx: jnp.ndarray  # (5,)
    ok: jnp.ndarray  # scalar bool
    homographies: jnp.ndarray  # (V, 3, 3)
    h_ok: jnp.ndarray  # (V,)
    c_se3_t: jnp.ndarray  # (V, 4, 4) per-view poses
    view_rms: jnp.ndarray  # (V,) symmetric homography RMS


def estimate_intrinsics(obj_xy, img_uv, mask=None, bounds=None):
    """Zhang pipeline: per-view DLT homographies -> K -> sanitize -> per-view
    pose decomposition (intrinsicsdlt.cpp:101-145).

    obj_xy/img_uv: (V, N, 2); mask: optional (V, N). RANSAC-robust
    homographies are available by pre-filtering with ops.ransac and passing
    the inlier masks here.
    """
    if mask is None:
        mask = jnp.ones(img_uv.shape[:-1], bool)
    pts_per_view = jnp.sum(mask, axis=-1)
    h_ok = pts_per_view >= H.MIN_SAMPLES

    hs = H.estimate_homography_dlt(obj_xy, img_uv, mask)
    h_ok = h_ok & jnp.all(jnp.isfinite(hs), axis=(-2, -1))
    view_rms = H.symmetric_rms_px(hs, obj_xy, img_uv, mask)

    kvec, k_ok = zhang.zhang_intrinsics_from_hs(hs, h_ok)
    kvec, _ = cm.sanitize_intrinsics(kvec, bounds)

    poses, _, _, pose_ok = planarpose.pose_from_homography_pixel(kvec, hs)
    del pose_ok  # reference only warns (intrinsicsdlt.cpp:92-95)
    return IntrinsicsEstimate(kvec, k_ok, hs, h_ok, poses, view_rms)


def estimate_intrinsics_linear(xy, uv, mask=None, bounds=None, use_skew: bool = False):
    """LSQ fit of u = fx*x (+ skew*y) + cx; v = fy*y + cy with degeneracy check
    and out-of-bounds fallback heuristics (intrinsicsdlt.cpp:147-312).

    xy: (N, 2) normalized; uv: (N, 2) pixels. Returns (kmtx (5,), ok).
    """
    if mask is None:
        mask = jnp.ones(xy.shape[:-1], bool)
    w = mask.astype(xy.dtype)
    x, y = xy[..., 0] * w, xy[..., 1] * w
    u, v = uv[..., 0] * w, uv[..., 1] * w

    if use_skew:
        au = jnp.stack([x, y, w], axis=-1)
    else:
        au = jnp.stack([x, w], axis=-1)
    av = jnp.stack([y, w], axis=-1)

    def solve(a, b):
        s = jnp.linalg.svd(a, compute_uv=False)
        ok = s[..., -1] >= 1e-12  # intrinsicsdlt.cpp:199
        sol = linalg.svd_lstsq(a, b)
        return sol, ok

    xu, ok_u = solve(au, u)
    xv, ok_v = solve(av, v)
    ok = ok_u & ok_v & (jnp.sum(w, axis=-1) >= 2)

    fx = xu[..., 0]
    fy = xv[..., 0]
    cx = xu[..., 2] if use_skew else xu[..., 1]
    cy = xv[..., 1]
    skew = xu[..., 1] if use_skew else jnp.zeros_like(fx)

    b = bounds if bounds is not None else cm.CalibrationBounds()
    out_of_bounds = (
        (fx < b.fx_min) | (fx > b.fx_max) | (fy < b.fy_min) | (fy > b.fy_max)
        | (cx < b.cx_min) | (cx > b.cx_max) | (cy < b.cy_min) | (cy > b.cy_max)
    )
    if use_skew:
        out_of_bounds = out_of_bounds | (skew < b.skew_min) | (skew > b.skew_max)

    # fallback heuristics (intrinsicsdlt.cpp:221-241)
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    avg_u = jnp.sum(u, axis=-1) / cnt
    avg_v = jnp.sum(v, axis=-1) / cnt
    safe_fx = jnp.clip(jnp.maximum(500.0, fx), b.fx_min, b.fx_max)
    safe_fy = jnp.clip(jnp.maximum(500.0, fy), b.fy_min, b.fy_max)
    safe_cx = jnp.clip(avg_u / 2.0, b.cx_min, b.cx_max)
    safe_cy = jnp.clip(avg_v / 2.0, b.cy_min, b.cy_max)
    safe_skew = jnp.clip(skew, b.skew_min, b.skew_max) if use_skew else jnp.zeros_like(fx)

    fx = jnp.where(out_of_bounds, safe_fx, fx)
    fy = jnp.where(out_of_bounds, safe_fy, fy)
    cx = jnp.where(out_of_bounds, safe_cx, cx)
    cy = jnp.where(out_of_bounds, safe_cy, cy)
    skew = jnp.where(out_of_bounds, safe_skew, skew)
    return jnp.stack([fx, fy, cx, cy, skew], axis=-1), ok


def estimate_intrinsics_linear_iterative(
    xy, uv, num_radial: int = 2, max_iterations: int = 5, use_skew: bool = False, mask=None
):
    """Alternate distortion fit <-> K re-estimation (intrinsicsdlt.cpp:319-368).

    Runs the fixed maximum iteration count (convergence early-exit becomes a
    no-op update; identical fixed point, static control flow). Returns
    (kmtx (5,), dist_coeffs (num_radial+2,), ok).
    """
    kmtx, ok0 = estimate_intrinsics_linear(xy, uv, mask=mask, use_skew=use_skew)

    def body(kmtx):
        coeffs, _, okd = dist.fit_distortion_full(xy, uv, kmtx, num_radial, mask=mask)
        # correct observations (intrinsicsdlt.cpp:247-268)
        distorted = dist.apply_distortion(xy, coeffs)
        delta = distorted - xy
        u_corr = uv[..., 0] - kmtx[..., 0] * delta[..., 0] - kmtx[..., 4] * delta[..., 1]
        v_corr = uv[..., 1] - kmtx[..., 1] * delta[..., 1]
        uv_corr = jnp.stack([u_corr, v_corr], axis=-1)
        k_new, okk = estimate_intrinsics_linear(xy, uv_corr, mask=mask, use_skew=use_skew)
        return jnp.where(okd & okk, k_new, kmtx)

    for _ in range(max_iterations):
        kmtx = body(kmtx)

    coeffs, _, okd = dist.fit_distortion_full(xy, uv, kmtx, num_radial, mask=mask)
    return kmtx, coeffs, ok0 & okd
