"""Small shared linear-algebra helpers (reference:
include/calib/estimation/common/se3_utils.h:53-63).

All batched-friendly; masked variants zero out invalid rows, which is exactly
equivalent to dropping them for least-squares and null-space problems.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

_SVD_RCOND = 1e-15


def inv3(m):
    """Closed-form 3x3 inverse via adjugate.

    XLA:TPU's LuDecomposition expander only supports f32/c64, so the f64
    compute path must never emit `jnp.linalg.inv`/`solve` — every 3x3
    inverse in the geometry code goes through this instead.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], -1),
            jnp.stack([co10, co11, co12], -1),
            jnp.stack([co20, co21, co22], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def svd_lstsq(a, b, rcond: float = _SVD_RCOND):
    """Minimum-norm least squares via SVD (TPU-f64 safe; jnp.linalg.lstsq
    lowers to LU-based paths on some backends)."""
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    cutoff = rcond * jnp.max(s, axis=-1, keepdims=True)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)
    utb = jnp.einsum("...ij,...i->...j", u, b)
    return jnp.einsum("...ij,...i->...j", vt, utb * s_inv)


# Batched tiny SPD solves dominate LM iteration latency on this attachment:
# XLA:TPU lowers jnp.linalg.cholesky / triangular_solve for small n to
# column-loop kernels whose per-op dispatch cost dwarfs the ~100 flops of a
# 6x6 factorization (measured: the damped 6x6/10x10 stage was 30% of a
# B=256 intrinsics LM iteration, benchmarks/exp_profile_iter.py). For
# static n in _UNROLL_SIZES the Cholesky-Crout recurrence is emitted as
# fully unrolled elementwise ops instead — XLA fuses them into a handful of
# kernels over the batch dims. Same math as Cholesky+cho_solve to roundoff.
#
# The size set is MEASURED, not a threshold: unrolling the 6x6 per-view
# blocks and the 10x10 Schur system is a ~20% win on the B=256 intrinsics
# bench (133.5 -> 146.8 solves/s for the 10x10 alone), but unrolling the
# 8x8 homography system at B=4096 is a 3x LOSS (76.6k vs 219.6k solves/s:
# at that batch the column-loop kernels amortize while the n^2/2 unrolled
# elementwise kernels thrash HBM). 12 covers the Scheimpflug 12x12 Schur
# block (B=256 generic-model bench: 38.8 vs 25.7 solves/s with the
# column-loop kernel, benchmarks round 4). Override with CALIB_SPD_UNROLL_SIZES
# (comma list) or CALIB_SPD_UNROLL_MAX=k (shorthand for {1..k}) for A/B.
if "CALIB_SPD_UNROLL_MAX" in os.environ:
    _UNROLL_SIZES = frozenset(range(1, int(os.environ["CALIB_SPD_UNROLL_MAX"]) + 1))
else:
    _UNROLL_SIZES = frozenset(
        int(s)
        for s in os.environ.get("CALIB_SPD_UNROLL_SIZES", "1,2,3,4,5,6,10,12").split(",")
        if s.strip()
    )


def _chol_unrolled(a, n):
    """Lower-triangular Cholesky factors as an n x n list of batch scalars."""
    l = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        d = jnp.sqrt(s)
        l[j][j] = d
        inv_diag[j] = 1.0 / d
        for i in range(j + 1, n):
            s2 = a[..., i, j]
            for k in range(j):
                s2 = s2 - l[i][k] * l[j][k]
            l[i][j] = s2 * inv_diag[j]
    return l, inv_diag


def _chol_solve_vec(l, inv_diag, bs, n):
    """Solve L L^T x = b for one RHS given as a list of batch scalars."""
    y = []
    for i in range(n):
        s = bs[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y.append(s * inv_diag[i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s * inv_diag[i]
    return x


def spd_solve(a, b):
    """Solve SPD system via Cholesky (TPU-f64 safe).

    Small static n unrolls to fused elementwise ops (see _UNROLL_SIZES note);
    larger systems use the XLA cholesky + triangular-solve kernels.
    """
    n = a.shape[-1]
    if n in _UNROLL_SIZES:
        l, inv_diag = _chol_unrolled(a, n)
        if b.ndim == a.ndim:  # matrix RHS (..., n, m)
            cols = []
            for c in range(b.shape[-1]):
                bs = [b[..., i, c] for i in range(n)]
                cols.append(jnp.stack(_chol_solve_vec(l, inv_diag, bs, n), -1))
            return jnp.stack(cols, -1)
        bs = [b[..., i] for i in range(n)]
        return jnp.stack(_chol_solve_vec(l, inv_diag, bs, n), -1)
    from jax.scipy.linalg import cho_solve

    low = jnp.linalg.cholesky(a)
    return cho_solve((low, True), b)


def spd_inverse(a):
    """Inverse of an SPD matrix via Cholesky.

    Small n: unrolled L inverse then A^-1 = L^-T L^-1 (fused elementwise);
    larger: XLA cholesky solve against I.
    """
    n = a.shape[-1]
    if n in _UNROLL_SIZES:
        l, inv_diag = _chol_unrolled(a, n)
        # forward-substitute L W = I column by column -> W = L^-1
        w = [[None] * n for _ in range(n)]  # w[i][c] = (L^-1)[i, c]
        for c in range(n):
            for i in range(n):
                if i < c:
                    w[i][c] = None
                    continue
                s = jnp.ones_like(l[0][0]) if i == c else jnp.zeros_like(l[0][0])
                for k in range(c, i):
                    if w[k][c] is not None:
                        s = s - l[i][k] * w[k][c]
                w[i][c] = s * inv_diag[i]
        # A^-1[r, c] = sum_k W[k][r] * W[k][c] (k >= max(r, c))
        rows = []
        for r in range(n):
            cols = []
            for c in range(n):
                s = None
                for k in range(max(r, c), n):
                    term = w[k][r] * w[k][c]
                    s = term if s is None else s + term
                cols.append(s)
            rows.append(jnp.stack(cols, -1))
        return jnp.stack(rows, -2)
    eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype), a.shape)
    return spd_solve(a, eye)


def solve_llsq(a, b):
    """Least-squares solve via SVD (se3_utils.h:53-55)."""
    return svd_lstsq(a, b)


def ridge_llsq(a, b, lam: float = 1e-10):
    """(A^T A + lam I)^-1 A^T b via Cholesky (se3_utils.h:57-63)."""
    n = a.shape[-1]
    ata = jnp.einsum("...ki,...kj->...ij", a, a) + lam * jnp.eye(n, dtype=a.dtype)
    atb = jnp.einsum("...ki,...k->...i", a, b)
    return spd_solve(ata, atb)


_NULLVEC_SVD_START = os.environ.get("CALIB_NULLVEC", "invpow") == "svd"


def smallest_singular_vector(a, via_gram: bool = True):
    """Right singular vector of the smallest singular value of a (..., M, N).

    The workhorse of every DLT/null-space estimator. Zeroed rows do not
    perturb the result (they contribute nothing to A^T A).

    ``via_gram`` computes the null vector from the N x N gram matrix A^T A
    (one MXU matmul + Cholesky inverse-power iteration) instead of an M x N
    SVD. Squares the condition number; with Hartley-normalized systems
    (cond ~1e3) that is far inside f64 range.

    The gram path is SVD-FREE by default: the batched tiny f64 SVD that used
    to seed the inverse iteration was (a) ~470 ms of a 567 ms B=256xV=10
    homography-DLT dispatch on this TPU (measured round 3 — Jacobi sweeps in
    f64 emulation dwarf everything else in the seed) and (b) occasionally
    WRONG for individual batch elements (see below). Instead the start
    vector is the largest-norm column of (G + eps I)^-1: that inverse is
    dominated by v0 v0^T / (lambda0 + eps), so its largest column already
    IS the null vector up to O(lambda0/lambda1); two inverse-power polish
    steps (matmuls with the same inverse) push any start-vector error down
    by (lambda0 + eps)^2/(lambda1 + eps)^2. CALIB_NULLVEC=svd restores the
    tiny-SVD start for A/B.

    The shift must clear Cholesky roundoff on an exactly-singular G
    (~ n*u*||G|| relative), else the factorization itself goes NaN;
    eps perturbs eigenVALUES only — G and G+eps*I share eigenvectors
    exactly — so a comfortably large 1e-12 relative shift costs nothing.
    (Historical note kept for the svd start: the batched f64 svd of tiny
    gram stacks occasionally returns a wrong or non-finite vector for
    individual batch elements while the unbatched call is exact; inverse
    iteration self-heals from ANY finite start, which is why both starts
    give identical results.)
    """
    m, n = a.shape[-2], a.shape[-1]
    if via_gram and m > n:
        g = jnp.einsum("...ki,...kj->...ij", a, a)
        tr = jnp.trace(g, axis1=-2, axis2=-1)
        # dtype-aware shift: 1e-12 relative in f64; in f32 (the homography
        # seed's coarse path) 1e-12 sits BELOW Cholesky roundoff on an
        # exactly-singular G (~n*u*||G||), which would NaN the factorization
        # on noiseless data — scale with the unit roundoff instead.
        # Eigenvectors are unchanged by any shift; polish quality degrades
        # only by ((lambda0+eps)/(lambda1+eps))^2 ~ 1e-11 even at f32 eps.
        u = float(jnp.finfo(a.dtype).eps)
        eps = (max(1e-12, 64.0 * u) / n) * tr + float(jnp.finfo(a.dtype).tiny)
        shifted = g + eps[..., None, None] * jnp.eye(n, dtype=a.dtype)
        if _NULLVEC_SVD_START:
            _, _, vt = jnp.linalg.svd(g)
            v = vt[..., -1, :]
            finite = jnp.all(jnp.isfinite(v), axis=-1, keepdims=True)
            v = jnp.where(finite, jnp.where(jnp.isfinite(v), v, 0.0),
                          jnp.ones_like(v) / jnp.sqrt(jnp.asarray(n, a.dtype)))
            w = v
            for _ in range(2):
                w_new = spd_solve(shifted, w)
                nrm = jnp.linalg.norm(w_new, axis=-1, keepdims=True)
                ok = jnp.all(jnp.isfinite(w_new), axis=-1, keepdims=True) & (nrm > 0)
                w = jnp.where(ok, w_new / jnp.where(ok, nrm, 1.0), w)
            return w
        inv = spd_inverse(shifted)
        # a non-finite inverse (G itself non-finite: fully-degenerate input)
        # falls back to a fixed start so downstream ok-flags see finite data
        inv_ok = jnp.all(jnp.isfinite(inv), axis=(-2, -1), keepdims=True)
        inv = jnp.where(inv_ok, jnp.where(jnp.isfinite(inv), inv, 0.0),
                        jnp.eye(n, dtype=a.dtype))
        col = jnp.argmax(jnp.sum(inv * inv, axis=-2), axis=-1)  # (...,)
        pick = col[..., None, None] == jnp.arange(n, dtype=col.dtype)[None, :]
        w = jnp.sum(inv * pick, axis=-1)  # (..., n) the chosen column
        nrm0 = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = w / jnp.where(nrm0 > 0, nrm0, 1.0)
        for _ in range(2):
            w_new = jnp.einsum("...ij,...j->...i", inv, w)
            nrm = jnp.linalg.norm(w_new, axis=-1, keepdims=True)
            ok = jnp.all(jnp.isfinite(w_new), axis=-1, keepdims=True) & (nrm > 0)
            w = jnp.where(ok, w_new / jnp.where(ok, nrm, 1.0), w)
        return w
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    return vt[..., -1, :]


def min_singular_value(a):
    s = jnp.linalg.svd(a, compute_uv=False)
    return s[..., -1]
