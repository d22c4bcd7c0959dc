"""Experiment: does seeding distortion linearly (fit_distortion_full from the
Zhang-seed poses) cut LM iterations on the flagship config-2 problem?

Runs the bench problem set with and without the distortion seed and prints
per-problem LM iteration counts + wall time. Round-3 lever (b)/(c) from
VERDICT.md: fewer iterations is a direct multiplier on batched throughput.

Usage: python benchmarks/exp_dist_seed.py [batch]
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
    import jax
    import jax.numpy as jnp

    from bench import make_problems
    from calibration_tpu.models import distortion as dmod
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.optim.intrinsics import optimize_intrinsics_device
    from calibration_tpu.ops import intrinsics_linear

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)
    obj, uv, poses_gt, intr_gt = make_problems(batch)

    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=40, epsilon=1e-9, compute_covariance=True)
    )

    def solve_fn(seed_dist: bool):
        @jax.jit
        def solve(obj, uv):
            mask = jnp.ones(obj.shape[:-1], obj.dtype)
            seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
            seed_kmtx = seed.kmtx.at[..., 4].set(0.0)
            if seed_dist:
                def fit_one(kmtx, poses, o, u, m):
                    # normalized ideal coords from the seed poses
                    rot = poses[:, :3, :3]
                    t = poses[:, :3, 3]
                    p3 = jnp.concatenate(
                        [o, jnp.zeros(o.shape[:-1] + (1,), o.dtype)], -1
                    )
                    pc = jnp.einsum("vij,vnj->vni", rot, p3) + t[:, None, :]
                    xy = pc[..., :2] / pc[..., 2:3]
                    coeffs, _, ok = dmod.fit_distortion_full(
                        xy.reshape(-1, 2), u.reshape(-1, 2), kmtx,
                        num_radial=3, mask=m.reshape(-1) > 0,
                    )
                    return jnp.where(ok, coeffs, jnp.zeros_like(coeffs))

                d0 = jax.vmap(fit_one)(seed_kmtx, seed.c_se3_t, obj, uv, mask)
            else:
                d0 = jnp.zeros(seed_kmtx.shape[:-1] + (5,), obj.dtype)
            intr0 = jnp.concatenate([seed_kmtx, d0], axis=-1)
            fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
                o, u, i0, p0, mask=m, opts=opts
            )
            out, intr, poses, view_errors, cov, cov_ok = jax.vmap(fn)(
                obj, uv, mask, intr0, seed.c_se3_t
            )
            return intr, out.cost, out.iterations, out.termination, view_errors
        return solve

    from bench_all import repeat_seed

    for label, sd in (("zero-dist-seed", False), ("linear-dist-seed", True)):
        solve = solve_fn(sd)
        t0 = time.time()
        intr, cost, iters, term, ve = solve(jnp.asarray(obj), jnp.asarray(uv))
        intr.block_until_ready()
        tc = time.time() - t0
        times = []
        for k in range(3):
            o2, u2, _, _ = make_problems(batch, seed=repeat_seed(7, k + 1))
            t0 = time.time()
            r = solve(jnp.asarray(o2), jnp.asarray(u2))
            r[0].block_until_ready()
            times.append(time.time() - t0)
        it = np.asarray(iters)
        rms = float(np.sqrt(np.mean(np.asarray(ve) ** 2)))
        fx_err = float(np.mean(np.abs(np.asarray(intr)[:, 0] - intr_gt[0])))
        print(
            f"{label}: compile+first={tc:.1f}s best={min(times):.3f}s "
            f"({batch/min(times):.1f} solves/s) iters min/med/max="
            f"{it.min()}/{int(np.median(it))}/{it.max()} "
            f"term={np.bincount(np.asarray(term), minlength=4).tolist()} "
            f"rms={rms:.4f}px fx_err={fx_err:.3f}"
        )


if __name__ == "__main__":
    main()
