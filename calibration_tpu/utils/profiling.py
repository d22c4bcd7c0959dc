"""Tracing / profiling hooks (SURVEY.md section 5: the reference's only
introspection is Ceres' BriefReport + final_cost; the rebuild adds
per-iteration cost traces and jax.profiler integration).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device results."""

    def __init__(self) -> None:
        self.elapsed: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def lm_cost_trace(residual_fn, x0, manifold, *, options=None, **lm_kwargs):
    """Run LM for a fixed iteration budget recording the cost after every
    iteration — the per-iteration trace the reference lacks (it only stores
    Ceres' final BriefReport, src/estimation/detail/ceresutils.h:41).

    Returns (LMOutput, costs (max_iterations,)). Implemented as a lax.scan of
    single LM steps so the trace is device-resident and jit-friendly.
    """
    import jax
    import jax.numpy as jnp

    from ..optim import lm as lm_mod
    from ..optim.core import OptimOptions

    options = options or OptimOptions()

    def one_iter_opts(_):
        return OptimOptions(
            optimizer=options.optimizer,
            huber_delta=options.huber_delta,
            epsilon=options.epsilon,
            max_iterations=1,
            compute_covariance=False,
            verbose=False,
        )

    opts1 = one_iter_opts(None)

    def step(x, _):
        out = lm_mod.lm_core(residual_fn, x, manifold, options=opts1, **lm_kwargs)
        return out.x, out.cost

    x_final, costs = jax.lax.scan(step, jnp.asarray(x0), None, length=options.max_iterations)
    out = lm_mod.lm_core(
        residual_fn, x_final, manifold,
        options=OptimOptions(
            optimizer=options.optimizer, huber_delta=options.huber_delta,
            epsilon=options.epsilon, max_iterations=1, compute_covariance=False,
        ),
        **lm_kwargs,
    )
    return out, costs
