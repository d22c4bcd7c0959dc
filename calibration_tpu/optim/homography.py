"""Non-linear homography refinement (reference:
src/estimation/optim/homography.cpp:75-175): 8 parameters with H22 == 1,
per-point transfer-error residuals, Huber loss per point block.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import homography as H
from . import lm
from .core import OptimOptions, OptimResult, TerminationType, brief_report
from .manifold import ProductManifold, euclid

_MANIFOLD = ProductManifold([euclid(8)])


def params_to_h(p):
    return jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1).reshape(
        p.shape[:-1] + (3, 3)
    )


def h_to_params(hm):
    hm = hm / hm[..., 2:3, 2:3]
    return hm.reshape(hm.shape[:-2] + (9,))[..., :8]


def _residual(p, obj_xy, img_uv, mask):
    hm = params_to_h(p)
    uv_hat = H.apply_homography(hm, obj_xy)
    r = (uv_hat - img_uv) * mask[..., None]
    return r.reshape(r.shape[:-2] + (-1,))


def optimize_homography_device(init_h, obj_xy, img_uv, mask=None, options=OptimOptions()):
    """Pure-jnp core (vmap/shard over problems). Returns (LMOutput, h, cov, cov_ok)."""
    n = obj_xy.shape[-2]
    if mask is None:
        mask = jnp.ones((n,), obj_xy.dtype)
    mask = jnp.asarray(mask, obj_xy.dtype)
    x0 = h_to_params(jnp.asarray(init_h))
    block_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), 2)

    res_fn = lambda p: _residual(p, obj_xy, img_uv, mask)
    out = lm.lm_core(
        res_fn, x0, _MANIFOLD, options=options, block_ids=block_ids, num_blocks=n
    )
    # m counts valid rows only (masked rows are zeroed, not observations)
    if options.compute_covariance:
        m = 2.0 * jnp.maximum(jnp.sum(mask), 1.0)
        cov, cov_ok = lm.covariance(
            res_fn, out.x, _MANIFOLD, scale_by_variance=True, num_residuals=m,
            block_ids=block_ids, num_blocks=n, huber_delta=options.huber_delta,
        )
    else:
        # skip the extra linearization + 8x8 solve when covariance is off
        cov = jnp.zeros((8, 8), x0.dtype)
        cov_ok = jnp.asarray(False)
    return out, params_to_h(out.x), cov, cov_ok


def homography_covariance_device(hm, obj_xy, img_uv, mask=None, options=OptimOptions()):
    """Covariance of the 8 free parameters at a solved homography — the
    deferred final pass for the phased batch path (same math as the inline
    covariance in optimize_homography_device; ceresutils.h:69-126
    semantics, ssr/(m-n) scaling)."""
    n = obj_xy.shape[-2]
    if mask is None:
        mask = jnp.ones((n,), obj_xy.dtype)
    mask = jnp.asarray(mask, obj_xy.dtype)
    x = h_to_params(jnp.asarray(hm))
    block_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), 2)
    res_fn = lambda p: _residual(p, obj_xy, img_uv, mask)
    m = 2.0 * jnp.maximum(jnp.sum(mask), 1.0)
    return lm.covariance(
        res_fn, x, _MANIFOLD, scale_by_variance=True, num_residuals=m,
        block_ids=block_ids, num_blocks=n, huber_delta=options.huber_delta,
    )


@dataclasses.dataclass
class OptimizeHomographyResult:
    core: OptimResult
    homography: np.ndarray


def optimize_homography(obj_xy, img_uv, init_h, options: OptimOptions = OptimOptions(), mask=None):
    """Host-facing wrapper mirroring optimize_homography (homography.cpp:140-175)."""
    obj_xy = jnp.asarray(obj_xy)
    if obj_xy.shape[0] < 4:
        raise ValueError("At least 4 correspondences are required.")
    out, hm, cov, cov_ok = optimize_homography_device(
        init_h, obj_xy, jnp.asarray(img_uv), mask=mask, options=options
    )
    core = OptimResult(
        success=bool(out.success),
        covariance=np.asarray(cov) if (options.compute_covariance and bool(cov_ok)) else None,
        final_cost=float(out.cost),
        iterations=int(out.iterations),
        termination=TerminationType(int(out.termination)),
        initial_cost=float(out.initial_cost),
    )
    core.report = brief_report(core)
    return OptimizeHomographyResult(core=core, homography=np.asarray(hm))
