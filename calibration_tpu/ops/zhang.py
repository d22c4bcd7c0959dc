"""Zhang's closed-form intrinsics from planar homographies (reference:
src/estimation/linear/zhang.cpp).

Masked & batched: pass up to V homographies with a validity mask; invalid
views contribute zero rows to the 2V x 6 system, which leaves its null space
untouched.
"""

from __future__ import annotations

import jax.numpy as jnp
from . import linalg


def _v_ij(h, i, j):
    """Zhang constraint row v_ij (zhang.cpp:112-124). h: (..., 3, 3)."""
    h0i, h1i, h2i = h[..., 0, i], h[..., 1, i], h[..., 2, i]
    h0j, h1j, h2j = h[..., 0, j], h[..., 1, j], h[..., 2, j]
    return jnp.stack(
        [
            h0i * h0j,
            h0i * h1j + h1i * h0j,
            h1i * h1j,
            h0i * h2j + h2i * h0j,
            h1i * h2j + h2i * h1j,
            h2i * h2j,
        ],
        axis=-1,
    )


def normalize_hmtx(h):
    """Single-scalar per-H normalization, sign-consistent (zhang.cpp:127-155)."""
    neg = h[..., 2, 2] < 0
    h = jnp.where(neg[..., None, None], -h, h)
    h33 = h[..., 2, 2]
    use_h33 = jnp.abs(h33) > 1e-12
    nf = jnp.linalg.norm(h, axis=(-2, -1))
    scale = jnp.where(use_h33, h33, jnp.where(nf > 1e-12, nf, 1.0))
    return h / scale[..., None, None]


def zhang_design_matrix(hs, mask=None):
    """Stack per-view rows [v12; v11-v22], row-normalized (zhang.cpp:157-188).

    hs: (V, 3, 3); mask: optional (V,). Returns (2V, 6).
    """
    hn = normalize_hmtx(hs)
    v12 = _v_ij(hn, 0, 1)
    v11 = _v_ij(hn, 0, 0)
    v22 = _v_ij(hn, 1, 1)

    def rownorm(r):
        s = jnp.linalg.norm(r, axis=-1, keepdims=True)
        return r / jnp.where(s > 0, s, 1.0)

    rows = jnp.stack([rownorm(v12), rownorm(v11 - v22)], axis=-2)  # (V, 2, 6)
    if mask is not None:
        # select, not multiply: an invalid view's H can be NaN (all-zero
        # padded view -> DLT null vector is backend-dependent garbage) and
        # NaN * 0 = NaN would poison the whole system
        rows = jnp.where(mask[..., None, None].astype(bool), rows, 0.0)
    return rows.reshape(rows.shape[:-3] + (2 * rows.shape[-3], 6))


def _bmtx_from_vec(b):
    """Symmetric B from 6-vector [b11,b12,b22,b13,b23,b33] (zhang.cpp:9-14)."""
    b11, b12, b22, b13, b23, b33 = (b[..., i] for i in range(6))
    m = jnp.stack(
        [
            jnp.stack([b11, b12, b13], -1),
            jnp.stack([b12, b22, b23], -1),
            jnp.stack([b13, b23, b33], -1),
        ],
        axis=-2,
    )
    return m


def _kmtx_from_dual_conic_try(bm):
    """Cholesky B = U^T U -> K = U^-1, normalized; returns (K, ok)
    (zhang.cpp:33-90). NaN Cholesky (non-SPD) -> ok=False."""
    low = jnp.linalg.cholesky(bm)  # B = L L^T, L lower; U = L^T
    u = jnp.swapaxes(low, -1, -2)
    ok = jnp.all(jnp.isfinite(low), axis=(-2, -1))
    u_safe = jnp.where(ok[..., None, None], u, jnp.broadcast_to(jnp.eye(3, dtype=bm.dtype), u.shape))
    k = linalg.inv3(u_safe)
    k22 = k[..., 2, 2]
    ok = ok & (jnp.abs(k22) > 1e-15) & jnp.all(jnp.isfinite(k), axis=(-2, -1))
    k = k / jnp.where(jnp.abs(k22) > 1e-15, k22, 1.0)[..., None, None]
    # conventional K: positive focals (zhang.cpp:66-69)
    flip = (k[..., 0, 0] <= 0) | (k[..., 1, 1] <= 0)
    k = jnp.where(flip[..., None, None], -k, k)
    return k, ok


def kmtx_from_dual_conic(bvec):
    """Try B then -B (b is homogeneous; zhang.cpp:80-89)."""
    bm = _bmtx_from_vec(bvec)
    bm = 0.5 * (bm + jnp.swapaxes(bm, -1, -2))
    k_pos, ok_pos = _kmtx_from_dual_conic_try(bm)
    k_neg, ok_neg = _kmtx_from_dual_conic_try(-bm)
    k = jnp.where(ok_pos[..., None, None], k_pos, k_neg)
    return k, ok_pos | ok_neg


def zhang_intrinsics_from_hs(hs, mask=None):
    """K from >= 4 homographies (zhang.cpp:171-208).

    hs: (V, 3, 3); mask: optional (V,). Returns (kmtx (...,5), ok).
    """
    vmtx = zhang_design_matrix(hs, mask)
    # the 2Vx6 system is tiny (V ~ 10 views) and less well-conditioned
    # than DLT stacks; keep the full SVD rather than the gram shortcut
    bvec = linalg.smallest_singular_vector(vmtx, via_gram=False)
    k33, ok = kmtx_from_dual_conic(bvec)
    kvec = jnp.stack(
        [k33[..., 0, 0], k33[..., 1, 1], k33[..., 0, 2], k33[..., 1, 2], k33[..., 0, 1]],
        axis=-1,
    )
    if mask is not None:
        ok = ok & (jnp.sum(mask.astype(jnp.int32), axis=-1) >= 4)
    return kvec, ok
