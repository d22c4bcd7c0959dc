"""Config-2S profile: decompose the Scheimpflug-vs-pinhole throughput gap
into (linearization count ratio) x (per-linearization cost ratio).

Round-4 verdict weak #4: BENCH_ALL says 2S runs at 0.327x of same-batch
pinhole while STATUS claimed 0.598x — and the round-3 note "the generic
path costs nothing" (CPU) seems to contradict a 3x device gap. The
decomposition here is the arbiter: both solves run the SAME batched
program shape (Schur LM, covariance ON like the bench rows), and each
reports (a) its linearization distribution and (b) its wall per
linearization-sweep, so the gap factors cleanly into "more LM work"
(structural — the tau/K/pose coupling needs ~12 linearizations vs ~5)
times "costlier model" (12-param jacfwd + ray/plane intersection chain).

Usage: python benchmarks/exp_scheim_profile.py [batch]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp

    import bench as headline
    from bench_all import repeat_seed, timed_batch
    from calibration_tpu.models import scheimpflug
    from calibration_tpu.ops import se3
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.parallel import batched

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)
    tilt = np.array([0.05, -0.04])

    def make_scheim(seed):
        obj, _, poses, intr10 = headline.make_problems(batch, seed=seed)
        intr10 = np.asarray(intr10).copy()
        intr10[8:10] = 0.0
        intr12 = np.concatenate([intr10, tilt])
        obj3 = jnp.concatenate([jnp.asarray(obj), jnp.zeros(obj.shape[:-1] + (1,))], -1)
        pts_c = se3.se3_apply(jnp.asarray(poses)[:, :, None], obj3)
        uv = np.asarray(scheimpflug.project(jnp.asarray(intr12), pts_c))
        uv = uv + np.random.default_rng(seed + 1).normal(0, 0.2, uv.shape)
        return obj, uv

    # same options as the BENCH_ALL 2S/2 rows (covariance ON)
    opts_s = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=60, compute_covariance=True),
        fixed_distortion_indices=(2, 3),
    )
    opts_p = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=60, compute_covariance=True)
    )

    rows = {}
    for name, model, opts, make in (
        ("pinhole", "pinhole_brown_conrady", opts_p,
         lambda s: headline.make_problems(batch, seed=s)[:2]),
        ("scheimpflug", "scheimpflug_pinhole_brown_conrady", opts_s, make_scheim),
    ):
        obj, uv = make(7)
        fn = lambda o, u, model=model, opts=opts: batched.intrinsics_batch(
            o, u, opts=opts, model_name=model
        )
        # intrinsics_batch returns (seed, (lm_out, intr, poses, errs, cov, ok))
        (_, out), dt = timed_batch(fn, (obj, uv), lambda k, make=make: make(repeat_seed(43, k)))
        lin = np.asarray(out[0].linearizations)
        rows[name] = (dt, lin)
        print(
            f"{name}: {batch/dt:.1f} solves/s | lin min/med/p90/max = "
            f"{lin.min()}/{np.median(lin):.0f}/{np.percentile(lin, 90):.0f}/{lin.max()}"
        )

    dt_p, lin_p = rows["pinhole"]
    dt_s, lin_s = rows["scheimpflug"]
    lin_ratio = float(np.median(lin_s) / np.median(lin_p))
    total_ratio = dt_s / dt_p
    per_lin_ratio = total_ratio / lin_ratio
    print(
        f"total {total_ratio:.2f}x = linearizations {lin_ratio:.2f}x "
        f"(med {np.median(lin_s):.0f} vs {np.median(lin_p):.0f}) "
        f"x per-linearization {per_lin_ratio:.2f}x"
    )


if __name__ == "__main__":
    main()
