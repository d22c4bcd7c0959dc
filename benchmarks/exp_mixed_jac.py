"""A/B sweep: f64 LM vs the mixed-precision modes on the flagship config-2
problem (precision="mixed_jac" = f32 Jacobian/gram phase + f64 polish;
precision="mixed" = full-f32 coarse phase + f64 polish), across coarse-phase
tolerances. Reports accuracy deltas vs the f64 arm so a speedup is only
claimed at parity.

Usage: python benchmarks/exp_mixed_jac.py [batch] [arm ...]
  arm = "f64" | "<precision>:<coarse_eps>", e.g. mixed_jac:1e-4 mixed:1e-3
  default arms: f64 mixed_jac:1e-4 mixed_jac:1e-5 mixed:1e-4 mixed:1e-3
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

DEFAULT_ARMS = ["f64", "mixed_jac:1e-4", "mixed_jac:1e-5", "mixed:1e-4", "mixed:1e-3"]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    arms = sys.argv[2:] or DEFAULT_ARMS
    import jax
    import jax.numpy as jnp

    from bench import make_problems
    from bench_all import repeat_seed
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.optim.intrinsics import optimize_intrinsics_device
    from calibration_tpu.ops import intrinsics_linear

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)
    obj, uv, poses_gt, intr_gt = make_problems(batch)

    core = OptimOptions(max_iterations=40, epsilon=1e-9, compute_covariance=True)

    def solve_fn(precision, coarse_eps):
        opts = IntrinsicsOptimOptions(core=core, mixed_coarse_epsilon=coarse_eps)

        @jax.jit
        def solve(obj, uv):
            mask = jnp.ones(obj.shape[:-1], obj.dtype)
            seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
            seed_kmtx = seed.kmtx.at[..., 4].set(0.0)
            intr0 = jnp.concatenate(
                [seed_kmtx, jnp.zeros(seed_kmtx.shape[:-1] + (5,), obj.dtype)], axis=-1
            )
            fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
                o, u, i0, p0, mask=m, opts=opts, precision=precision
            )
            out, intr, poses, ve, cov, _ = jax.vmap(fn)(obj, uv, mask, intr0, seed.c_se3_t)
            return intr, out.cost, out.iterations, ve, cov
        return solve

    results = {}
    for arm in arms:
        precision, _, eps_s = arm.partition(":")
        coarse_eps = float(eps_s) if eps_s else 1e-4
        solve = solve_fn(precision, coarse_eps)
        t0 = time.time()
        r0 = solve(jnp.asarray(obj), jnp.asarray(uv))
        r0[0].block_until_ready()
        tc = time.time() - t0
        times = []
        for k in range(3):
            o2, u2, _, _ = make_problems(batch, seed=repeat_seed(43, k + 1))
            t0 = time.time()
            r = solve(jnp.asarray(o2), jnp.asarray(u2))
            r[0].block_until_ready()
            times.append(time.time() - t0)
        intr, cost, iters, ve, cov = (np.asarray(a) for a in r0)
        results[arm] = (intr, cost, cov)
        print(
            f"{arm}: compile+first={tc:.1f}s best={min(times):.3f}s "
            f"({batch/min(times):.1f} solves/s) "
            f"polish iters med/max={int(np.median(iters))}/{iters.max()} "
            f"rms={float(np.sqrt(np.mean(ve**2))):.4f}px"
        )

    if "f64" in results:
        i64, c64, cov64 = results["f64"]
        for arm, (ia, ca, cova) in results.items():
            if arm == "f64":
                continue
            print(
                f"{arm} vs f64: max|dintr|={np.abs(i64 - ia).max():.3e} "
                f"max rel dcost={np.abs(c64 - ca).max() / np.abs(c64).max():.3e} "
                f"max rel dcov={np.abs(cov64 - cova).max() / max(np.abs(cov64).max(), 1e-300):.3e}"
            )


if __name__ == "__main__":
    main()
