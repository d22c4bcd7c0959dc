"""RANSAC tests (reference: tests/unit/homography_test.cpp RANSAC scenarios,
planefit_test.cpp outlier rejection)."""

import numpy as np
import jax.numpy as jnp

from calibration_tpu.ops import homography as H
from calibration_tpu.ops import planefit
from calibration_tpu.ops.ransac import RansacOptions, ransac_homography, ransac_plane


def _homography_with_outliers(n_in=60, n_out=15, noise=0.0, seed=42):
    rng = np.random.default_rng(seed)
    h = np.array([[1.05, 0.08, 15.0], [-0.03, 0.98, -4.0], [1e-4, -5e-5, 1.0]])
    src = rng.uniform(-3, 3, (n_in + n_out, 2))
    dst = np.array(H.apply_homography(jnp.asarray(h), jnp.asarray(src)))
    if noise:
        dst += rng.normal(0, noise, dst.shape)
    outlier_idx = rng.choice(n_in + n_out, n_out, replace=False)
    dst[outlier_idx] += rng.uniform(30, 80, (n_out, 2)) * np.sign(rng.normal(size=(n_out, 2)))
    return h, src, dst, outlier_idx


def test_ransac_homography_outlier_rejection():
    h, src, dst, outlier_idx = _homography_with_outliers()
    opts = RansacOptions(max_iters=300, thresh=2.0, min_inliers=12)
    res = ransac_homography(jnp.asarray(src), jnp.asarray(dst), opts)
    assert bool(res.success)
    inl = np.asarray(res.inlier_mask)
    # all outliers rejected
    assert not inl[outlier_idx].any()
    assert inl.sum() >= 55
    np.testing.assert_allclose(np.asarray(res.model), h, atol=1e-6)


def test_ransac_homography_deterministic():
    h, src, dst, _ = _homography_with_outliers(seed=3)
    opts = RansacOptions(max_iters=200)
    r1 = ransac_homography(jnp.asarray(src), jnp.asarray(dst), opts)
    r2 = ransac_homography(jnp.asarray(src), jnp.asarray(dst), opts)
    np.testing.assert_array_equal(np.asarray(r1.model), np.asarray(r2.model))


def test_ransac_homography_failure_all_outliers():
    rng = np.random.default_rng(1)
    src = rng.uniform(-3, 3, (30, 2))
    dst = rng.uniform(-300, 300, (30, 2))
    opts = RansacOptions(max_iters=100, thresh=0.5, min_inliers=25)
    res = ransac_homography(jnp.asarray(src), jnp.asarray(dst), opts)
    assert not bool(res.success)


def test_ransac_plane():
    rng = np.random.default_rng(9)
    n = np.array([0.2, 0.3, 0.933])
    n /= np.linalg.norm(n)
    d = -1.1
    basis = np.linalg.svd(n[None])[2][1:]
    pts = (-d) * n + rng.uniform(-2, 2, (80, 2)) @ basis
    pts[60:] += rng.uniform(2, 5, (20, 1)) * n  # 20 off-plane outliers
    opts = RansacOptions(max_iters=200, thresh=0.05, min_inliers=30)
    res = ransac_plane(jnp.asarray(pts), opts)
    assert bool(res.success)
    plane = np.asarray(res.model)
    if plane[:3] @ n < 0:
        plane = -plane
    np.testing.assert_allclose(plane[:3], n, atol=1e-6)
    np.testing.assert_allclose(plane[3], d, atol=1e-6)
    assert int(res.inlier_count) == 60


def test_ransac_masked_padding():
    # padded invalid data must never be selected as inliers
    h, src, dst, _ = _homography_with_outliers(n_in=40, n_out=5, seed=8)
    pad = 20
    src_p = np.concatenate([src, np.zeros((pad, 2))])
    dst_p = np.concatenate([dst, np.zeros((pad, 2))])
    mask = np.concatenate([np.ones(len(src), bool), np.zeros(pad, bool)])
    res = ransac_homography(
        jnp.asarray(src_p), jnp.asarray(dst_p), RansacOptions(max_iters=200), mask=jnp.asarray(mask)
    )
    assert bool(res.success)
    assert not np.asarray(res.inlier_mask)[len(src):].any()


def test_calculate_iterations_reference_math():
    """calculate_iterations matches ransac.h:64-78 exactly: ceil(log(1-p) /
    log(1 - w^m)), clamped to [iters_so_far, max_iters]; degenerate inputs
    fall back to max_iters."""
    import math

    from calibration_tpu.ops.ransac import calculate_iterations

    def ref(p, w, m, it, mx):
        if p <= 0.0 or w <= 0.0:
            return mx
        denom = math.log(max(1e-12, 1.0 - w**m))
        if denom >= 0.0:
            return mx
        niter = int(math.ceil(math.log(1.0 - p) / denom))
        return min(max(niter, it), mx)

    cases = [
        (0.99, 0.8, 4, 1, 1000),   # textbook: ~9 iterations
        (0.99, 0.5, 4, 1, 1000),   # ~71
        (0.99, 0.2, 4, 1, 1000),   # ~2876 -> clamp 1000
        (0.999, 0.9, 3, 5, 1000),
        (0.99, 0.0, 4, 1, 1000),   # ratio 0 -> max
        (0.0, 0.8, 4, 1, 1000),    # confidence 0 -> max
        (0.99, 1.0, 4, 1, 1000),   # denom >= 0 -> max
        (0.99, 0.95, 4, 500, 1000),  # clamp below iters_so_far
    ]
    for p, w, m, it, mx in cases:
        got = int(calculate_iterations(p, w, m, it, mx))
        assert got == ref(p, w, m, it, mx), (p, w, m, it, mx, got)


def test_ransac_adaptive_early_exit():
    """With a high inlier ratio the adaptive bound stops after one round
    (ransac.h confidence semantics); confidence<=0 disables early exit and
    runs the full budget. Quality is unchanged either way."""
    h, src, dst, outlier_idx = _homography_with_outliers()
    opts = RansacOptions(max_iters=1024, thresh=2.0, min_inliers=12, round_size=128)
    res = ransac_homography(jnp.asarray(src), jnp.asarray(dst), opts)
    assert bool(res.success)
    # 60/75 inliers, k=4: required iters ~ log(.01)/log(1-.8^4) ~ 9 << 128
    assert int(res.iters) == 128
    assert not np.asarray(res.inlier_mask)[outlier_idx].any()
    np.testing.assert_allclose(np.asarray(res.model), h, atol=1e-6)

    full = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst),
        RansacOptions(max_iters=1024, thresh=2.0, min_inliers=12,
                      round_size=128, confidence=0.0),
    )
    assert int(full.iters) == 1024
    np.testing.assert_allclose(np.asarray(full.model), h, atol=1e-6)


def test_ransac_adaptive_under_vmap():
    """The round loop is a lax.while_loop, so the adaptive path must work
    under vmap (the facade prefilter vmaps ransac_homography over views)."""
    import jax

    h, src, dst, _ = _homography_with_outliers(seed=5)
    src_b = jnp.stack([jnp.asarray(src)] * 3)
    dst_b = jnp.stack([jnp.asarray(dst)] * 3)
    opts = RansacOptions(max_iters=512, round_size=64)
    fn = lambda s, d: ransac_homography(s, d, opts)
    out = jax.vmap(fn)(src_b, dst_b)
    assert np.asarray(out.success).all()
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out.model)[i], h, atol=1e-6)
