"""Hartley-normalized DLT homography estimation — masked, batched, vmappable
(reference: src/estimation/linear/homographyestimator.cpp).

The reference runs one 2Nx9 JacobiSVD per fit inside a sequential RANSAC
loop; here a fit is a pure function of fixed-shape arrays so thousands of
hypotheses/views run as one batched SVD on the accelerator.
"""

from __future__ import annotations

import jax.numpy as jnp
from . import linalg

MIN_SAMPLES = 4  # homographyestimator.h:20
COLLINEARITY_EPS = 1e-6  # homographyestimator.cpp:107


def normalize_points_2d(pts, mask=None):
    """Hartley normalization transform (homographyestimator.cpp:16-44).

    pts: (..., N, 2); mask: optional (..., N). Returns (pts_normalized, T)
    where T is the (..., 3, 3) similarity with ``pn = T @ p`` (homogeneous).
    """
    if mask is None:
        w = jnp.ones(pts.shape[:-1], pts.dtype)
    else:
        w = mask.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    centroid = jnp.sum(pts * w[..., None], axis=-2) / cnt
    diff = pts - centroid[..., None, :]
    dist = jnp.linalg.norm(diff, axis=-1) * w
    mean_dist = jnp.sum(dist, axis=-1) / cnt[..., 0]
    sigma = jnp.where(mean_dist > 0, jnp.sqrt(2.0) / jnp.where(mean_dist > 0, mean_dist, 1.0), 1.0)

    z = jnp.zeros_like(sigma)
    o = jnp.ones_like(sigma)
    t = jnp.stack(
        [
            jnp.stack([sigma, z, -sigma * centroid[..., 0]], -1),
            jnp.stack([z, sigma, -sigma * centroid[..., 1]], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    out = diff * sigma[..., None, None]
    return out, t


def dlt_homography_normalized(src, dst, mask=None):
    """2Nx9 SVD null-vector DLT on pre-normalized points
    (homographyestimator.cpp:46-70). Masked rows are zeroed."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    row_u = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    row_v = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    a = jnp.stack([row_u, row_v], axis=-2)  # (..., N, 2, 9)
    if mask is not None:
        a = a * mask[..., None, None].astype(a.dtype)
    a = a.reshape(a.shape[:-3] + (2 * a.shape[-3], 9))
    h = linalg.smallest_singular_vector(a)
    hm = h.reshape(h.shape[:-1] + (3, 3))
    return hm / hm[..., 2:3, 2:3]


def estimate_homography_dlt(src, dst, mask=None):
    """Hartley-normalize both sides, DLT, denormalize
    (homographyestimator.cpp:72-81). src/dst: (..., N, 2)."""
    src_n, t_src = normalize_points_2d(src, mask)
    dst_n, t_dst = normalize_points_2d(dst, mask)
    h_norm = dlt_homography_normalized(src_n, dst_n, mask)
    h = linalg.inv3(t_dst) @ h_norm @ t_src
    h22 = h[..., 2:3, 2:3]
    return jnp.where(jnp.abs(h22) > 1e-15, h / jnp.where(jnp.abs(h22) > 1e-15, h22, 1.0), h)


def apply_homography(h, pts):
    """h: (..., 3, 3); pts: (..., N, 2) -> (..., N, 2)."""
    ph = jnp.concatenate([pts, jnp.ones(pts.shape[:-1] + (1,), pts.dtype)], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", h, ph)
    return q[..., :2] / q[..., 2:3]


def symmetric_transfer_error(h, src, dst):
    """Per-point symmetric transfer error (homographyestimator.cpp:83-97).

    sqrt(0.5 * (|dst - H src|^2 + |src - H^-1 dst|^2)) per point.
    """
    hinv = linalg.inv3(h)
    dst_hat = apply_homography(h, src)
    src_hat = apply_homography(hinv, dst)
    e1 = jnp.sum((dst - dst_hat) ** 2, axis=-1)
    e2 = jnp.sum((src - src_hat) ** 2, axis=-1)
    return jnp.sqrt(0.5 * (e1 + e2))


def has_near_collinear_triplet(pts, sample_mask=None, eps: float = COLLINEARITY_EPS):
    """Degeneracy check over all triplets (homographyestimator.cpp:100-119).

    pts: (..., K, 2) — K is the (static) minimal-sample size, so the triple
    loop unrolls to K-choose-3 area evaluations.
    """
    k = pts.shape[-2]
    flags = []
    for i in range(k):
        for j in range(i + 1, k):
            for l in range(j + 1, k):
                a, b, c = pts[..., i, :], pts[..., j, :], pts[..., l, :]
                area = jnp.abs(
                    (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1])
                    - (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0])
                )
                flags.append(area < eps)
    return jnp.any(jnp.stack(flags, axis=-1), axis=-1)


def symmetric_rms_px(h, src, dst, inlier_mask):
    """RMS-like aggregate the reference reports per view
    (src/estimation/linear/intrinsicsdlt.cpp:22-30): sqrt(sum(residual) / (2*count))
    over inliers — note the reference sums the *residual values* (not squares)."""
    r = symmetric_transfer_error(h, src, dst)
    w = inlier_mask.astype(r.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    return jnp.sqrt(jnp.sum(r * w, axis=-1) / (2.0 * cnt))


def estimate_homography(obj_xy, img_uv, mask=None, ransac_options=None):
    """DLT-on-all or RANSAC homography with diagnostics — the
    `estimate_homography` entry point (include/calib/estimation/linear/
    homography.h:15-24; impl src/estimation/optim/homography.cpp:30-73).

    Returns a dict mirroring HomographyResult: {"success", "hmtx",
    "inlier_mask", "symmetric_rms_px"}.
    """
    import jax.numpy as jnp

    obj_xy = jnp.asarray(obj_xy)
    img_uv = jnp.asarray(img_uv)
    if mask is None:
        mask = jnp.ones(obj_xy.shape[:-1], bool)
    mask = jnp.asarray(mask)

    if ransac_options is not None:
        from .ransac import ransac_homography

        rr = ransac_homography(obj_xy, img_uv, ransac_options, mask=mask)
        return {
            "success": rr.success,
            "hmtx": rr.model,
            "inlier_mask": rr.inlier_mask,
            "symmetric_rms_px": symmetric_rms_px(rr.model, obj_xy, img_uv, rr.inlier_mask),
        }

    h = estimate_homography_dlt(obj_xy, img_uv, mask)
    ok = (jnp.sum(mask) >= MIN_SAMPLES) & jnp.all(jnp.isfinite(h))
    return {
        "success": ok,
        "hmtx": h,
        "inlier_mask": mask,
        "symmetric_rms_px": symmetric_rms_px(h, obj_xy, img_uv, mask),
    }
