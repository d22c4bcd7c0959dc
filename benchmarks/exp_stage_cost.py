"""Decompose the config-2 batched solve's wall time into its three stages —
linear seed (homography DLT + Zhang + pose init), LM refine, covariance —
by timing three jits on distinct same-shape datasets (memoization-proof).

The per-iteration profile (exp_profile_iter.py) covers the LM step only;
this answers where the OTHER time goes: if the seed or covariance is a
large fixed slice, that is a different optimization axis than the LM loop.

Usage: python benchmarks/exp_stage_cost.py [batch] [repeats]
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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp

    from bench import make_problems
    from bench_all import repeat_seed
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.optim.intrinsics import optimize_intrinsics_device
    from calibration_tpu.ops import intrinsics_linear

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)

    def seed_fn(obj, uv):
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
        seed_kmtx = seed.kmtx.at[..., 4].set(0.0)
        intr0 = jnp.concatenate(
            [seed_kmtx, jnp.zeros(seed_kmtx.shape[:-1] + (5,), obj.dtype)], axis=-1
        )
        return intr0, seed.c_se3_t

    def lm_fn(obj, uv, intr0, poses0, compute_covariance):
        opts = IntrinsicsOptimOptions(
            core=OptimOptions(
                max_iterations=40, epsilon=1e-9,
                compute_covariance=compute_covariance,
            )
        )
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
            o, u, i0, p0, mask=m, opts=opts
        )
        out, intr, poses, ve, cov, _ = jax.vmap(fn)(obj, uv, mask, intr0, poses0)
        return intr, out.cost, cov

    seed_jit = jax.jit(seed_fn)
    lm_cov_jit = jax.jit(lambda o, u, i, p: lm_fn(o, u, i, p, True))
    lm_nocov_jit = jax.jit(lambda o, u, i, p: lm_fn(o, u, i, p, False))

    def timed(fn, datasets):
        ts = []
        for args in datasets:
            t0 = time.time()
            out = fn(*args)
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
            ts.append(time.time() - t0)
        return ts  # ts[0] includes compile

    # distinct datasets per repeat; seeds salted per process (bench_all)
    sets = [make_problems(batch, seed=repeat_seed(61, k))[:2] for k in range(repeats + 1)]
    sets = [(jnp.asarray(o), jnp.asarray(u)) for o, u in sets]

    t_seed = timed(seed_jit, sets)
    seeds = [seed_jit(*s) for s in sets]
    lm_sets = [(o, u, s[0], s[1]) for (o, u), s in zip(sets, seeds)]
    for a in lm_sets[-1]:
        a.block_until_ready()
    t_cov = timed(lm_cov_jit, lm_sets)
    t_nocov = timed(lm_nocov_jit, lm_sets)

    def rep(name, ts):
        print(
            f"{name}: compile+first={ts[0]:.2f}s best={min(ts[1:]):.3f}s "
            f"({batch / min(ts[1:]):.1f}/s)",
            flush=True,
        )

    rep("seed (DLT+Zhang+pose)", t_seed)
    rep("LM+covariance", t_cov)
    rep("LM no-cov", t_nocov)
    best_seed, best_cov, best_nocov = (min(t[1:]) for t in (t_seed, t_cov, t_nocov))
    print(
        f"shares of full solve ~{best_seed + best_cov:.3f}s: "
        f"seed {100 * best_seed / (best_seed + best_cov):.0f}% | "
        f"LM {100 * best_nocov / (best_seed + best_cov):.0f}% | "
        f"covariance {100 * (best_cov - best_nocov) / (best_seed + best_cov):.0f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
