"""Experiment: does a cheap per-view pose polish (a few fixed Gauss-Newton
steps at the Zhang K, zero distortion) cut JOINT LM linearizations on the
flagship config-2 problem?

Rationale: the joint jacfwd linearization costs O(m * (10 + 6V)) while a
per-view pose-only step costs O(m * 6) — roughly 12x cheaper at V=10 — so
trading k pose steps for even one saved joint linearization is a win. The
decision stat is the batch MAX of joint linearizations (the vmapped
while_loop cost), plus final-cost parity so a faster arm is only adopted at
the same minimum.

Usage: python benchmarks/exp_pose_seed.py [batch] [gn_steps ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    arms = [int(a) for a in sys.argv[2:]] or [0, 1, 2, 3]
    import jax
    import jax.numpy as jnp

    from bench import make_problems
    from calibration_tpu.models import pinhole
    from calibration_tpu.ops import se3, linalg, intrinsics_linear
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.optim.intrinsics import optimize_intrinsics_device

    print(f"backend={jax.default_backend()} batch={batch} arms={arms}", file=sys.stderr)
    obj, uv, poses_gt, intr_gt = make_problems(batch)

    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=40, epsilon=1e-9, compute_covariance=True)
    )

    def pose_polish(intr0, pose, o, u, m, steps):
        """`steps` damped Gauss-Newton steps on the 6-dof tangent of ONE
        view's pose, fixed intrinsics (Zhang K, zero distortion)."""

        def res6(d, p):
            dp = se3.se3_exp(d)
            pts = jnp.concatenate([o, jnp.zeros(o.shape[:-1] + (1,), o.dtype)], -1)
            pc = se3.se3_apply(p @ dp, pts)
            return ((pinhole.project(intr0, pc) - u) * m[..., None]).reshape(-1)

        def body(p, _):
            z = jnp.zeros((6,), o.dtype)
            jac = jax.jacfwd(res6)(z, p)
            r = res6(z, p)
            g = jac.T @ r
            h = jac.T @ jac + 1e-9 * jnp.eye(6, dtype=o.dtype)
            d = -linalg.spd_solve(h, g)
            # accept only if the step reduces cost (crude damping: GN with
            # rejection keeps the polish from diverging on a bad seed view)
            better = jnp.sum(res6(d, p) ** 2) < jnp.sum(r**2)
            return jnp.where(better, p @ se3.se3_exp(d), p), None

        out, _ = jax.lax.scan(body, pose, None, length=steps)
        return out

    def solve_fn(steps: int):
        @jax.jit
        def solve(obj, uv):
            mask = jnp.ones(obj.shape[:-1], obj.dtype)
            seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
            seed_kmtx = seed.kmtx.at[..., 4].set(0.0)
            intr0 = jnp.concatenate(
                [seed_kmtx, jnp.zeros(seed_kmtx.shape[:-1] + (5,), obj.dtype)], -1
            )
            poses0 = seed.c_se3_t
            if steps > 0:
                poses0 = jax.vmap(
                    lambda i0, ps, o, u, m: jax.vmap(
                        lambda p, ov, uvv, mv: pose_polish(i0, p, ov, uvv, mv, steps)
                    )(ps, o, u, m)
                )(intr0, poses0, obj, uv, mask)
            fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
                o, u, i0, p0, mask=m, opts=opts
            )
            out, intr, poses, view_errors, cov, cov_ok = jax.vmap(fn)(
                obj, uv, mask, intr0, poses0
            )
            return intr, out.cost, out.iterations, out.linearizations, view_errors
        return solve

    results = {}
    for steps in arms:
        solve = solve_fn(steps)
        t0 = time.time()
        intr, cost, iters, lins, ve = (
            np.asarray(a) for a in solve(jnp.asarray(obj), jnp.asarray(uv))
        )
        tc = time.time() - t0
        results[steps] = dict(cost=float(np.sum(cost)), lin_max=int(lins.max()))
        print(
            f"gn_steps={steps}: joint linearizations med/mean/max = "
            f"{np.median(lins):.0f}/{lins.mean():.2f}/{lins.max()}  "
            f"trials max = {iters.max()}  cost_sum={np.sum(cost):.12e}  "
            f"rms={np.sqrt(np.mean(ve ** 2)):.4f}px  (compile+run {tc:.1f}s)"
        )
    if 0 in results:
        base = results[0]["cost"]
        for steps, r in results.items():
            rel = abs(r["cost"] - base) / max(abs(base), 1e-300)
            print(f"gn_steps={steps}: cost parity vs 0 = {rel:.3e}  lin_max={r['lin_max']}")


if __name__ == "__main__":
    main()
