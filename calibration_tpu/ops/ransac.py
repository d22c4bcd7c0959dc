"""Batched RANSAC (reference: include/calib/estimation/common/ransac.h).

TPU-native redesign: instead of a sequential, adaptively-early-exiting
hypothesis loop (ransac.h:143-191), sample ``max_iters`` minimal sets at
once, fit them with one batched solve, score all residuals on-device, and
select the best by (inlier count, then lower inlier RMS) — the same
best-model rule as the reference (ransac.h:113-117). The adaptive stopping
criterion is a CPU latency optimization with no effect on the selected
model's quality; a fixed hypothesis budget is strictly at least as thorough.

Sampling without replacement uses the Gumbel top-k trick over masked data,
seeded from ``RansacOptions.seed`` for reproducibility (the counter-based
replacement for the reference's mt19937_64 seed 1234567, ransac.h:27).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RansacOptions:
    """Defaults match ransac.h:22-29."""

    max_iters: int = 1000
    thresh: float = 2.0
    min_inliers: int = 12
    confidence: float = 0.99  # kept for config parity; batch mode uses fixed K
    seed: int = 1234567
    refit_on_inliers: bool = True


class RansacResult(NamedTuple):
    success: jnp.ndarray
    model: object
    inlier_mask: jnp.ndarray  # (N,)
    inlier_count: jnp.ndarray
    inlier_rms: jnp.ndarray
    best_hypothesis: jnp.ndarray


def _sample_minimal_sets(key, n, k_min, num_hypotheses, mask):
    """(H, k_min) index sets without replacement, restricted to valid data."""
    logp = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (num_hypotheses, n)) + logp[None, :]
    _, idx = jax.lax.top_k(g, k_min)
    return idx


def ransac(
    data,
    *,
    fit_fn: Callable,
    residual_fn: Callable,
    k_min_samples: int,
    options: RansacOptions = RansacOptions(),
    mask=None,
    degenerate_fn: Optional[Callable] = None,
    refit_fn: Optional[Callable] = None,
    rng_key=None,
):
    """Generic estimator-driven RANSAC (the ``ransac<Estimator>`` template,
    ransac.h:121-194).

    Args:
      data: pytree of arrays with leading axis N (the datum axis).
      fit_fn: minimal-sample fit — pytree with leading axis ``k_min_samples``
        -> (model pytree, ok bool).
      residual_fn: (model, data) -> (N,) residuals.
      k_min_samples: static minimal-sample size (Estimator::k_min_samples).
      mask: optional (N,) datum validity for ragged batches.
      degenerate_fn: optional minimal-sample degeneracy predicate.
      refit_fn: optional (data, inlier_mask) -> (model, ok), used for the
        final refit-on-inliers pass (HasRefit concept, ransac.h:42-46).
      rng_key: optional explicit jax PRNG key (defaults to options.seed).
    """
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(options.seed)

    num_h = options.max_iters
    idx = _sample_minimal_sets(rng_key, n, k_min_samples, num_h, mask)  # (H, k)
    minimal = jax.tree_util.tree_map(lambda a: a[idx], data)  # (H, k, ...)

    models, fit_ok = jax.vmap(fit_fn)(minimal)
    if degenerate_fn is not None:
        degen = jax.vmap(degenerate_fn)(minimal)
        fit_ok = fit_ok & ~degen
    # a hypothesis drawing any invalid datum is void (can happen only when
    # fewer than k_min valid data exist)
    fit_ok = fit_ok & jnp.all(mask[idx], axis=-1)

    res = jax.vmap(lambda m: residual_fn(m, data))(models)  # (H, N)
    inl = (res <= options.thresh) & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    w = inl.astype(res.dtype)
    rms = jnp.sqrt(jnp.sum(res * res * w, axis=-1) / jnp.maximum(counts, 1))

    valid = fit_ok & (counts >= options.min_inliers)
    score = jnp.where(
        valid,
        counts.astype(res.dtype) * 1e9 - jnp.minimum(rms, 1e8),
        -jnp.inf,
    )
    best = jnp.argmax(score)
    success = valid[best]
    best_model = jax.tree_util.tree_map(lambda a: a[best], models)
    best_inl = inl[best]
    best_rms = rms[best]
    best_count = counts[best]

    if options.refit_on_inliers and refit_fn is not None:
        re_model, re_ok = refit_fn(data, best_inl)
        re_res = residual_fn(re_model, data)
        re_inl = (re_res <= options.thresh) & mask
        re_count = jnp.sum(re_inl)
        re_w = re_inl.astype(res.dtype)
        re_rms = jnp.sqrt(jnp.sum(re_res * re_res * re_w) / jnp.maximum(re_count, 1))
        use = re_ok & success
        best_model = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(use, (1,) * a.ndim), b, a), best_model, re_model
        )
        best_inl = jnp.where(use, re_inl, best_inl)
        best_rms = jnp.where(use, re_rms, best_rms)
        best_count = jnp.where(use, re_count, best_count)

    best_rms = jnp.where(success, best_rms, jnp.inf)
    return RansacResult(success, best_model, best_inl, best_count, best_rms, best)


# ---------------------------------------------------------------------------
# Concrete estimators
# ---------------------------------------------------------------------------

def ransac_homography(obj_xy, img_uv, options: RansacOptions = RansacOptions(), mask=None):
    """HomographyEstimator under RANSAC (src/estimation/linear/homographyestimator.cpp):
    4-point Hartley DLT fit, symmetric transfer residual, collinearity
    degeneracy check, full-inlier refit."""
    from . import homography as H

    data = {"src": obj_xy, "dst": img_uv}

    def fit(d):
        h = H.estimate_homography_dlt(d["src"], d["dst"])
        return h, jnp.all(jnp.isfinite(h))

    def resid(h, d):
        return H.symmetric_transfer_error(h, d["src"], d["dst"])

    def degen(d):
        return H.has_near_collinear_triplet(d["src"])

    def refit(d, inl):
        h = H.estimate_homography_dlt(d["src"], d["dst"], inl)
        return h, jnp.all(jnp.isfinite(h)) & (jnp.sum(inl) >= H.MIN_SAMPLES)

    return ransac(
        data,
        fit_fn=fit,
        residual_fn=resid,
        k_min_samples=H.MIN_SAMPLES,
        options=options,
        mask=mask,
        degenerate_fn=degen,
        refit_fn=refit,
    )


def ransac_plane(pts, options: RansacOptions = RansacOptions(), mask=None):
    """3-point plane RANSAC with SVD refit (src/estimation/linear/planefit.cpp:9-62)."""
    from . import planefit

    def fit(p):
        return planefit.fit_plane_3pt(p[0], p[1], p[2])

    def resid(plane, p):
        return planefit.plane_point_distance(plane, p)

    def degen(p):
        nrm = jnp.linalg.norm(jnp.cross(p[1] - p[0], p[2] - p[0]), axis=-1)
        return nrm < 1e-12

    def refit(p, inl):
        return planefit.fit_plane_svd(p, inl), jnp.sum(inl) >= 3

    return ransac(
        pts,
        fit_fn=fit,
        residual_fn=resid,
        k_min_samples=3,
        options=options,
        mask=mask,
        degenerate_fn=degen,
        refit_fn=refit,
    )
