"""Batched RANSAC (reference: include/calib/estimation/common/ransac.h).

TPU-native redesign: instead of a sequential, adaptively-early-exiting
hypothesis loop (ransac.h:143-191), sample minimal sets in ROUNDS of
``round_size`` hypotheses — each round is one batched fit + one batched
scoring pass — and select the best by (inlier count, then lower inlier RMS),
the same best-model rule as the reference (ransac.h:113-117). After each
round the reference's adaptive iteration bound (``calculate_iterations``,
ransac.h:64-78) is evaluated from the best inlier ratio so far, and the
round loop exits early once the hypothesis budget exceeds it — the same
``confidence`` semantics, amortized over device-sized batches. The (H, N)
residual matrix is therefore capped at (round_size, N) regardless of
``max_iters``.

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
    """Defaults match ransac.h:22-29 (round_size is the batching grain of
    the TPU redesign — hypotheses per device dispatch)."""

    max_iters: int = 1000
    thresh: float = 2.0
    min_inliers: int = 12
    confidence: float = 0.99
    seed: int = 1234567
    refit_on_inliers: bool = True
    round_size: int = 128


def calculate_iterations(confidence, inlier_ratio, min_samples, iters_so_far, max_iters):
    """The reference's adaptive RANSAC bound (ransac.h:64-78), jnp-traced:
    smallest N with P(at least one all-inlier minimal sample in N draws)
    >= confidence, clamped to [iters_so_far, max_iters]; degenerate inputs
    (confidence<=0, ratio<=0, denom>=0) fall back to max_iters."""
    inlier_ratio = jnp.asarray(inlier_ratio, jnp.float64)
    denom = jnp.log(jnp.maximum(1e-12, 1.0 - inlier_ratio**min_samples))
    bad = (confidence <= 0.0) | (inlier_ratio <= 0.0) | (denom >= 0.0)
    # log(1 - p) / denom, both negative for sane inputs
    niter = jnp.ceil(jnp.log(jnp.maximum(1e-300, 1.0 - confidence)) / denom)
    niter = jnp.where(bad, max_iters, niter)
    return jnp.clip(niter, iters_so_far, max_iters).astype(jnp.int32)


class RansacResult(NamedTuple):
    success: jnp.ndarray
    model: object
    inlier_mask: jnp.ndarray  # (N,)
    inlier_count: jnp.ndarray
    inlier_rms: jnp.ndarray
    # hypotheses actually evaluated (RansacResult::iters, ransac.h:37 —
    # a multiple of round_size under the batched adaptive loop)
    iters: jnp.ndarray


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

    round_size = min(options.round_size, options.max_iters)
    num_rounds = -(-options.max_iters // round_size)  # ceil

    def run_round(key):
        """One batched round: sample + fit + score ``round_size`` hypotheses,
        return the round-best (score, model, inliers, rms, count)."""
        idx = _sample_minimal_sets(key, n, k_min_samples, round_size, mask)
        minimal = jax.tree_util.tree_map(lambda a: a[idx], data)  # (K, k, ...)

        models, fit_ok = jax.vmap(fit_fn)(minimal)
        if degenerate_fn is not None:
            degen = jax.vmap(degenerate_fn)(minimal)
            fit_ok = fit_ok & ~degen
        # a hypothesis drawing any invalid datum is void (can happen only
        # when fewer than k_min valid data exist)
        fit_ok = fit_ok & jnp.all(mask[idx], axis=-1)

        res = jax.vmap(lambda m: residual_fn(m, data))(models)  # (K, N)
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
        b = jnp.argmax(score)
        model_b = jax.tree_util.tree_map(lambda a: a[b], models)
        return score[b], model_b, inl[b], rms[b], counts[b]

    n_valid = jnp.sum(mask)

    # round 0 always runs (max_iters >= 1) and initializes the carried best
    score0, model0, inl0, rms0, count0 = run_round(jax.random.fold_in(rng_key, 0))

    if num_rounds > 1:
        # adaptive multi-round loop (reference loop, ransac.h:142-191): after
        # each round, re-evaluate the confidence bound from the best inlier
        # ratio so far and stop once the spent hypothesis budget covers it
        def cond(state):
            r, best_score, *_ = state
            iters_done = r * round_size
            count = state[5]
            ratio = count / jnp.maximum(n_valid, 1)
            dyn = calculate_iterations(
                options.confidence, ratio, k_min_samples, iters_done, options.max_iters
            )
            return (r < num_rounds) & (iters_done < dyn)

        def body(state):
            r, best_score, best_model, best_inl, best_rms, best_count = state
            s, m, i, q, c = run_round(jax.random.fold_in(rng_key, r))
            better = s > best_score
            merge = lambda a, b: jnp.where(
                jnp.reshape(better, (1,) * jnp.ndim(a)), b, a
            )
            return (
                r + 1,
                jnp.where(better, s, best_score),
                jax.tree_util.tree_map(merge, best_model, m),
                jnp.where(better, i, best_inl),
                jnp.where(better, q, best_rms),
                jnp.where(better, c, best_count),
            )

        state = (jnp.asarray(1), score0, model0, inl0, rms0, count0)
        rounds_done, score0, model0, inl0, rms0, count0 = jax.lax.while_loop(
            cond, body, state
        )
    else:
        rounds_done = jnp.asarray(1)

    success = score0 > -jnp.inf
    best_model, best_inl, best_rms, best_count = model0, inl0, rms0, count0

    if options.refit_on_inliers and refit_fn is not None:
        re_model, re_ok = refit_fn(data, best_inl)
        re_res = residual_fn(re_model, data)
        re_inl = (re_res <= options.thresh) & mask
        re_count = jnp.sum(re_inl)
        re_w = re_inl.astype(re_res.dtype)
        re_rms = jnp.sqrt(jnp.sum(re_res * re_res * re_w) / jnp.maximum(re_count, 1))
        use = re_ok & success
        best_model = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(use, (1,) * a.ndim), b, a), best_model, re_model
        )
        best_inl = jnp.where(use, re_inl, best_inl)
        best_rms = jnp.where(use, re_rms, best_rms)
        best_count = jnp.where(use, re_count, best_count)

    best_rms = jnp.where(success, best_rms, jnp.inf)
    return RansacResult(
        success, best_model, best_inl, best_count, best_rms, rounds_done * round_size
    )


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
