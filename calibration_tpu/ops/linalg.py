"""Small shared linear-algebra helpers (reference:
include/calib/estimation/common/se3_utils.h:53-63).

All batched-friendly; masked variants zero out invalid rows, which is exactly
equivalent to dropping them for least-squares and null-space problems.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_llsq(a, b):
    """Least-squares solve via SVD (se3_utils.h:53-55)."""
    return jnp.linalg.lstsq(a, b)[0]


def ridge_llsq(a, b, lam: float = 1e-10):
    """(A^T A + lam I)^-1 A^T b via Cholesky (se3_utils.h:57-63)."""
    n = a.shape[-1]
    ata = jnp.einsum("...ki,...kj->...ij", a, a) + lam * jnp.eye(n, dtype=a.dtype)
    atb = jnp.einsum("...ki,...k->...i", a, b)
    return jnp.linalg.solve(ata, atb)


def smallest_singular_vector(a):
    """Right singular vector of the smallest singular value of a (..., M, N).

    The workhorse of every DLT/null-space estimator. Zeroed rows do not
    perturb the result (they contribute nothing to A^T A).
    """
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    return vt[..., -1, :]


def min_singular_value(a):
    s = jnp.linalg.svd(a, compute_uv=False)
    return s[..., -1]
