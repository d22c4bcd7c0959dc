"""Plane fitting: centroid+SVD and 3-point minimal fits (reference:
src/estimation/linear/planefit.cpp). RANSAC wiring lives in ops.ransac.
"""

from __future__ import annotations

import jax.numpy as jnp


def fit_plane_svd(pts, mask=None):
    """Centroid + smallest right singular vector (planefit.cpp:68-85).

    pts: (..., N, 3); mask: optional (..., N). Returns (..., 4) [n, d] with
    unit normal and n.p + d = 0.
    """
    if mask is None:
        w = jnp.ones(pts.shape[:-1], pts.dtype)
    else:
        w = mask.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    centroid = jnp.sum(pts * w[..., None], axis=-2) / cnt
    a = (pts - centroid[..., None, :]) * w[..., None]
    from . import linalg

    normal = linalg.smallest_singular_vector(a)
    d = -jnp.sum(normal * centroid, axis=-1)
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return jnp.concatenate([normal / nrm, (d / nrm[..., 0])[..., None]], axis=-1)


def fit_plane_3pt(p0, p1, p2):
    """Minimal 3-point plane (planefit.cpp:14-34). Returns (plane (4,), ok)."""
    v1 = p1 - p0
    v2 = p2 - p0
    normal = jnp.cross(v1, v2)
    nrm = jnp.linalg.norm(normal, axis=-1)
    ok = nrm >= 1e-12
    normal = normal / jnp.maximum(nrm, 1e-12)[..., None]
    d = -jnp.sum(normal * p0, axis=-1)
    return jnp.concatenate([normal, d[..., None]], axis=-1), ok


def plane_point_distance(plane, pts):
    """|n.p + d| per point. plane: (..., 4); pts: (..., N, 3)."""
    return jnp.abs(jnp.einsum("...i,...ni->...n", plane[..., :3], pts) + plane[..., 3:4])


def plane_rms(plane, pts, mask=None):
    """RMS of signed distances (linescan.h:93-99)."""
    r = jnp.einsum("...i,...ni->...n", plane[..., :3], pts) + plane[..., 3:4]
    if mask is None:
        w = jnp.ones_like(r)
    else:
        w = mask.astype(r.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    return jnp.sqrt(jnp.sum(r * r * w, axis=-1) / cnt)
