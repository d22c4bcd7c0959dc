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
    """Run LM recording the cost after every LINEARIZATION — the
    per-iteration trace the reference lacks (it only stores Ceres' final
    BriefReport, src/estimation/detail/ceresutils.h:41).

    Since the cached-linearization restructure, one scanned step = one
    linearization plus its damping-retry loop, so ``costs`` has one entry
    per linearization; the index matching the returned
    ``LMOutput.linearizations``, NOT ``LMOutput.iterations`` (which counts
    trials, i.e. accepted steps + rejected re-solves).

    Scans the SAME ``LMState -> LMState`` step ``lm_core`` runs under
    ``while_loop`` — (x, mu, nu, termination) carry across iterations — so the
    recorded trajectory and the returned LMOutput are exactly what a plain
    ``lm_core`` call with the same options produces (asserted by
    tests/test_lm_solvers.py::test_lm_cost_trace_matches_core). After
    termination the state is frozen, so the tail of ``costs`` is flat at the
    final cost.

    Returns (LMOutput, costs (max_iterations,)); device-resident and
    jit-friendly.
    """
    import jax
    import jax.numpy as jnp

    from ..optim import lm as lm_mod
    from ..optim.core import OptimOptions

    options = options or OptimOptions()
    init, step, _cond = lm_mod.make_lm_step(
        residual_fn, jnp.asarray(x0), manifold, options=options, **lm_kwargs
    )

    def scan_step(state, _):
        nxt = step(state)
        # freeze once terminated (while_loop's cond), keeping the scan length
        # static without perturbing the trajectory
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(state.done, a, b), state, nxt
        )
        return out, out.cost

    final, costs = jax.lax.scan(scan_step, init, None, length=options.max_iterations)
    out = lm_mod.LMOutput(
        x=final.x,
        cost=final.cost,
        initial_cost=init.cost,
        iterations=final.it,
        termination=final.termination,
        success=final.termination > 0,
        linearizations=final.lin,
    )
    return out, costs
