"""From-scratch Levenberg-Marquardt engine — the Ceres replacement.

One pure-jnp function (`lm_core`) runs the damped normal-equation iteration
under ``lax.while_loop``: jacfwd autodiff Jacobians in the manifold tangent
space, Huber IRLS weighting per residual block, diagonal (Marquardt) damping
with the Nielsen mu-update, box-bound projection, and free-mask gauge/subset
fixing. Everything is fixed-shape, so whole batches of problems vmap and
shard across a device mesh.

Replaces ceres::Solve as configured by the reference
(src/estimation/detail/ceresutils.h:21-43): function/gradient/parameter
tolerances all = OptimOptions.epsilon, success iff converged by tolerance.
Covariance = scaled inverse JtJ lifted to ambient coordinates
(ceresutils.h:69-126).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from ..ops import linalg

from .core import OptimOptions
from .manifold import ProductManifold

# Initial Nielsen damping for the Jacobi-scaled system (diag ~ 1, so this
# is tau directly). Ceres' default is 1e-4; measured on the config-2
# problem set (benchmarks/exp_mu_init.py, backend-independent counts,
# trials and linearizations reported separately): 1e-6 converges to the
# SAME minimum (cost parity ~1e-12) in median 6 linearizations vs 9 at
# 1e-4, with ZERO rejected trials in any arm (trials == linearizations),
# so the optimistic start costs nothing. For a vmapped batch the
# while_loop runs to the batch MAX, which is the stat that sets
# wall-clock: 7 at 1e-6 vs 11 at 1e-4 (1.57x). 1e-8 is not better where
# it counts (median 5 but the same max 7) and leaves less damping
# headroom for poor seeds. CALIB_LM_MU_INIT overrides for A/B sweeps.
_MU_INIT = float(os.environ.get("CALIB_LM_MU_INIT", "1e-6"))
_MU_MIN = 1e-32
_MU_MAX = 1e32


class LMState(NamedTuple):
    x: jnp.ndarray  # ambient params
    mu: jnp.ndarray  # damping
    nu: jnp.ndarray  # damping growth factor
    cost: jnp.ndarray
    it: jnp.ndarray  # TRIALS: accepted steps + rejected damping re-solves
    done: jnp.ndarray
    termination: jnp.ndarray  # TerminationType code
    grad_max: jnp.ndarray
    lin: jnp.ndarray  # LINEARIZATIONS: residual+Jacobian evaluations


class _TrialState(NamedTuple):
    """Inner (fixed-linearization) damping-retry loop state — see
    lm_schur._TrialState; Ceres' LevenbergMarquardtStrategy likewise caches
    the Jacobian across rejected steps and only re-linearizes after an
    acceptance."""

    x: jnp.ndarray
    cost: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    accepted: jnp.ndarray
    termination: jnp.ndarray


class LMOutput(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray  # trials (Ceres Summary.iterations analogue)
    termination: jnp.ndarray  # 0 no-conv, 1 ftol, 2 gtol, 3 xtol, 4 failure
    success: jnp.ndarray
    # residual+Jacobian evaluations — the dominant per-iteration cost; with
    # the cached-linearization retry loop, iterations >= linearizations and
    # the gap counts rejected (cheap re-solve) trials
    linearizations: jnp.ndarray


def _robust_weights(r, block_ids, num_blocks, huber_delta):
    """Huber IRLS weights per residual block.

    Ceres applies the loss to each residual block's squared norm
    (rho(|r_b|^2), one HuberLoss per AddResidualBlock). IRLS weight is
    rho'(s): 1 inside the delta ball, delta/|r_b| outside. Returns
    (row_weights (m,), robust_cost = 0.5 * sum rho(s_b))."""
    s = jax.ops.segment_sum(r * r, block_ids, num_segments=num_blocks)
    d2 = huber_delta * huber_delta
    out = s > d2
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-300))
    wb = jnp.where(out, huber_delta / sqrt_s, 1.0)
    rho = jnp.where(out, 2.0 * huber_delta * sqrt_s - d2, s)
    return wb[block_ids], 0.5 * jnp.sum(rho)


def _plain_cost(r):
    return 0.5 * jnp.sum(r * r)


def make_lm_step(
    residual_fn: Callable,
    x0,
    manifold: ProductManifold,
    *,
    options: OptimOptions = OptimOptions(),
    free_mask=None,
    block_ids=None,
    num_blocks: int = 0,
    lower=None,
    upper=None,
    jac_fn: Optional[Callable] = None,
) -> tuple[LMState, Callable, Callable]:
    """Build one LM iteration as a pure ``LMState -> LMState`` function.

    Returns (init_state, step, cond): ``lm_core`` runs
    ``while_loop(cond, step, init_state)``; profiling/tracing callers scan
    ``step`` instead, carrying the SAME state (x, mu, nu, ...) across
    iterations so a recorded trajectory is bit-identical to a real solve.

    Args: see ``lm_core``.
    """
    eps = options.epsilon
    huber = options.huber_delta
    tdim = manifold.tangent_dim
    x0 = jnp.asarray(x0)
    dtype = x0.dtype

    if free_mask is None:
        tan_free = jnp.ones((tdim,), dtype)
    else:
        tan_free = manifold.ambient_to_tangent_mask(jnp.asarray(free_mask)).astype(dtype)

    def clip_x(x):
        if lower is not None:
            x = jnp.maximum(x, jnp.asarray(lower, dtype))
        if upper is not None:
            x = jnp.minimum(x, jnp.asarray(upper, dtype))
        return x

    use_huber = huber > 0

    def cost_at(x):
        r = residual_fn(x)
        if use_huber and block_ids is not None:
            _, c = _robust_weights(r, block_ids, num_blocks, huber)
            return c
        if use_huber:
            ids = jnp.zeros(r.shape, jnp.int32)
            _, c = _robust_weights(r, ids, 1, huber)
            return c
        return _plain_cost(r)

    def residual_and_jac(x):
        if jac_fn is not None:
            # analytic tangent Jacobian at x (must equal jacfwd of the
            # retracted residual at zero tangent; assumes box bounds are
            # inactive at the iterate, matching Ceres' interior
            # linearization)
            return residual_fn(x), jac_fn(x)
        zero = jnp.zeros((tdim,), dtype)
        rt = lambda d: residual_fn(clip_x(manifold.retract(x, d)))
        r = rt(zero)
        jac = jax.jacfwd(rt)(zero)  # (m, tdim)
        return r, jac

    x_init = clip_x(x0)
    cost0 = cost_at(x_init)

    def weighted(r, jac):
        if use_huber:
            ids = block_ids if block_ids is not None else jnp.zeros(r.shape, jnp.int32)
            nb = num_blocks if block_ids is not None else 1
            w, _ = _robust_weights(r, ids, nb, huber)
            sw = jnp.sqrt(w)
            return r * sw, jac * sw[:, None]
        return r, jac

    def step(state: LMState) -> LMState:
        """One LINEARIZATION: residual+Jacobian once at the current iterate,
        then an inner damping-retry loop re-solving the cached normal
        equations with growing mu until a step is accepted (or a
        tolerance/max-iter exit). Bit-identical trajectory to
        re-linearizing every trial — J at an unchanged iterate is
        deterministic — at a fraction of the rejected-trial cost (the
        jacfwd is the dominant per-iteration term)."""
        x = state.x
        r, jac = residual_and_jac(x)
        rw, jw = weighted(r, jac)
        jw = jw * tan_free[None, :]
        g = jw.T @ rw
        a = jw.T @ jw

        grad_max = jnp.max(jnp.abs(g))
        gtol_hit = grad_max <= eps

        diag = jnp.clip(jnp.diagonal(a), 1e-12, 1e32) * tan_free + (1.0 - tan_free)
        # Jacobi-scaled damped normal equations: with D = diag(A)^-1/2 the
        # scaled system has unit diagonal, so Marquardt damping is mu*I and
        # the Cholesky sees condition ~cond(D A D) instead of cond(A) —
        # parameters here span ~1e-4 (tangential coeffs) to ~1e3 (focals).
        d = jnp.where(tan_free > 0, 1.0 / jnp.sqrt(diag), 0.0)
        a_s = d[:, None] * a * d[None, :] + jnp.diag(1.0 - tan_free)
        x_norm = jnp.linalg.norm(x)

        def trial(t: _TrialState) -> _TrialState:
            # gate on per-lane activity: under vmap every lane runs the
            # body, and an accepted/terminated lane's cached (a_s, g) no
            # longer matches its iterate — its state must not move
            active = (~t.accepted) & (t.termination == 0) & (
                t.it < options.max_iterations
            )
            mu = t.mu
            sys = a_s + mu * jnp.diag(tan_free)
            delta = -d * linalg.spd_solve(sys, d * g)
            delta = delta * tan_free
            delta_ok = jnp.all(jnp.isfinite(delta))
            delta = jnp.where(delta_ok, delta, 0.0)

            step_norm = jnp.linalg.norm(delta)
            xtol_hit = delta_ok & (step_norm <= eps * (x_norm + eps))

            x_new = clip_x(manifold.retract(x, delta))
            cost_new = cost_at(x_new)
            pred = 0.5 * jnp.dot(delta, mu * diag * delta - g)
            rho = (state.cost - cost_new) / jnp.where(pred > 0, pred, 1e-300)
            accept = active & delta_ok & jnp.isfinite(cost_new) & (rho > 0) & (pred > 0)

            ftol_hit = accept & (jnp.abs(state.cost - cost_new) <= eps * state.cost)

            factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            mu_acc = jnp.clip(mu * factor, _MU_MIN, _MU_MAX)
            mu_rej = jnp.clip(mu * t.nu, _MU_MIN, _MU_MAX)

            term = jnp.where(
                gtol_hit, 2, jnp.where(xtol_hit, 3, jnp.where(ftol_hit, 1, 0))
            ).astype(jnp.int32)
            return _TrialState(
                x=jnp.where(accept, x_new, t.x),
                cost=jnp.where(accept, cost_new, t.cost),
                mu=jnp.where(active, jnp.where(accept, mu_acc, mu_rej), t.mu),
                nu=jnp.where(active, jnp.where(accept, 2.0, t.nu * 2.0), t.nu),
                it=jnp.where(active, t.it + 1, t.it),
                accepted=t.accepted | accept,
                termination=jnp.where(active, term, t.termination),
            )

        def trial_cond(t: _TrialState):
            return (~t.accepted) & (t.termination == 0) & (
                t.it < options.max_iterations
            )

        t0 = _TrialState(
            x=x,
            cost=state.cost,
            mu=state.mu,
            nu=state.nu,
            it=state.it,
            accepted=jnp.asarray(False),
            termination=jnp.asarray(0, jnp.int32),
        )
        tf = jax.lax.while_loop(trial_cond, trial, t0)
        return LMState(
            tf.x, tf.mu, tf.nu, tf.cost, tf.it, tf.termination > 0,
            tf.termination, grad_max, state.lin + 1,
        )

    def cond(state: LMState):
        return (~state.done) & (state.it < options.max_iterations)

    init = LMState(
        x=x_init,
        mu=jnp.asarray(_MU_INIT, dtype),
        nu=jnp.asarray(2.0, dtype),
        cost=cost0,
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        termination=jnp.asarray(0, jnp.int32),
        grad_max=jnp.asarray(jnp.inf, dtype),
        lin=jnp.asarray(0, jnp.int32),
    )
    return init, step, cond


def lm_core(
    residual_fn: Callable,
    x0,
    manifold: ProductManifold,
    *,
    options: OptimOptions = OptimOptions(),
    free_mask=None,
    block_ids=None,
    num_blocks: int = 0,
    lower=None,
    upper=None,
    jac_fn: Optional[Callable] = None,
) -> LMOutput:
    """Minimize 0.5 * sum rho(|r|^2) over the manifold.

    Args:
      residual_fn: ambient params -> (m,) residuals (masked rows must be
        zeroed by the caller; zero rows are invisible to the normal
        equations).
      x0: (ambient_dim,) initial ambient parameters.
      manifold: parameter-block structure.
      free_mask: optional (ambient_dim,) bool; False coordinates are frozen
        (SubsetManifold / SetParameterBlockConstant / gauge fixing).
      block_ids: optional (m,) int32 robust-loss block id per residual row
        (the AddResidualBlock granularity). None => single block when
        huber_delta > 0.
      num_blocks: static count of robust-loss blocks.
      lower/upper: optional (ambient_dim,) box bounds, enforced by projection
        after each retract (SetParameterLowerBound equivalent).
      jac_fn: optional analytic tangent Jacobian, x -> (m, tangent_dim).
        Must equal jacfwd of the retracted residual at zero tangent
        (equivalence-tested per solver); None -> jacfwd autodiff.
    """
    init, step, cond = make_lm_step(
        residual_fn,
        x0,
        manifold,
        options=options,
        free_mask=free_mask,
        block_ids=block_ids,
        num_blocks=num_blocks,
        lower=lower,
        upper=upper,
        jac_fn=jac_fn,
    )
    final = jax.lax.while_loop(cond, step, init)
    success = final.termination > 0
    return LMOutput(
        x=final.x,
        cost=final.cost,
        initial_cost=init.cost,
        iterations=final.it,
        termination=final.termination,
        success=success,
        linearizations=final.lin,
    )


def covariance(
    residual_fn: Callable,
    x,
    manifold: ProductManifold,
    *,
    free_mask=None,
    scale_by_variance: bool = False,
    num_residuals: Optional[int] = None,
    block_ids=None,
    num_blocks: int = 0,
    huber_delta: float = 0.0,
    jac_r=None,
    jac_fn: Optional[Callable] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ambient-space covariance at the solution (ceresutils.h:69-126).

    C_tangent = (J^T J)^-1 on free dims; lifted C_ambient = D C_t D^T with D
    the retract jacobian — matching Ceres' manifold-lifted covariance blocks.
    When ``scale_by_variance`` (homography / planar-pose paths,
    src/estimation/optim/homography.cpp:160-168), multiplies by
    ssr / max(1, m - n) with n = total *ambient* parameter count, exactly as
    ceresutils.h:117-123.

    When ``huber_delta`` > 0 the Jacobian rows are rescaled by sqrt(rho')
    exactly as the LM iteration weights them — ceres::Covariance evaluates
    the loss-corrected Jacobian, so blocks pushed into the Huber tail
    contribute with reduced information. Pass the same block_ids/num_blocks
    given to ``lm_core``. In the quadratic region (all weights 1) this is
    identical to the unrobustified covariance. ``scale_by_variance`` then
    uses the robust cost for ssr, matching Ceres' summary.final_cost.

    ``jac_r``: optional precomputed (r (m,), jac (m, tangent_dim)) pair.
    Block-separable solvers (optim.lm_schur) assemble the full tangent
    Jacobian from per-view blocks far cheaper than the pc+6V-tangent
    jacfwd here; the math from the gram matrix onward is shared.

    Returns (cov (ambient, ambient), ok).
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    tdim = manifold.tangent_dim
    if free_mask is None:
        tan_free = jnp.ones((tdim,), dtype)
    else:
        tan_free = manifold.ambient_to_tangent_mask(jnp.asarray(free_mask)).astype(dtype)

    if jac_r is not None:
        r, jac = jac_r
    elif jac_fn is not None:
        r, jac = residual_fn(x), jac_fn(x)
    else:
        zero = jnp.zeros((tdim,), dtype)
        rt = lambda d: residual_fn(manifold.retract(x, d))
        r = rt(zero)
        jac = jax.jacfwd(rt)(zero)
    jac = jac * tan_free[None, :]
    ssr = jnp.sum(r * r)
    if huber_delta > 0:
        ids = block_ids if block_ids is not None else jnp.zeros(r.shape, jnp.int32)
        nb = num_blocks if block_ids is not None else 1
        w, robust_cost = _robust_weights(r, ids, nb, huber_delta)
        jac = jac * jnp.sqrt(w)[:, None]
        ssr = 2.0 * robust_cost
    a = jac.T @ jac + jnp.diag(1.0 - tan_free)
    c_t = linalg.spd_inverse(a)
    c_t = c_t * tan_free[:, None] * tan_free[None, :]
    d = manifold.lift_jacobian(x)
    cov = d @ c_t @ d.T
    ok = jnp.all(jnp.isfinite(cov))
    if scale_by_variance:
        # num_residuals may be a traced scalar (masked/padded problems pass the
        # *valid* row count, matching ceresutils.h:117-123 where m counts real
        # residuals — padded rows are zeroed, not observations).
        m = num_residuals if num_residuals is not None else r.shape[0]
        dof = jnp.maximum(1.0, jnp.asarray(m, r.dtype) - manifold.ambient_dim)
        cov = cov * (ssr / dof)
    return cov, ok


def covariance_from_tangent(c_t, x, manifold: ProductManifold, free_mask=None):
    """Lift a precomputed tangent covariance (e.g. lm_schur.tangent_covariance's
    block inverse) into ambient coordinates: C = D C_t D^T with D the retract
    Jacobian — the tail of ``covariance`` without re-forming the gram.
    Returns (cov (ambient, ambient), ok)."""
    x = jnp.asarray(x)
    if free_mask is not None:
        tan_free = manifold.ambient_to_tangent_mask(jnp.asarray(free_mask)).astype(
            x.dtype
        )
        c_t = c_t * tan_free[:, None] * tan_free[None, :]
    d = manifold.lift_jacobian(x)
    cov = d @ c_t @ d.T
    return cov, jnp.all(jnp.isfinite(cov))
