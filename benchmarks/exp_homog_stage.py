"""Config-1 (homography DLT+LM) stage decomposition + phase/batch sweep.

Unlike config 3, the timed region includes the DLT seed (homography_batch
runs estimate_homography_dlt inside), so this experiment separates:
(a) seed-only throughput, (b) the LM linearization distribution that sizes
the phase schedule, (c) a replay-guarded sweep over batch x schedule
(single-phase reference arm + phased arms), with per-arm final-cost parity.

Usage: python benchmarks/exp_homog_stage.py [batches] [repeats]
  batches: comma list, default "4096,8192"
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
    batches = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "4096,8192").split(",")]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp

    from bench_all import repeat_seed, timed_batch
    from benchmarks import problems as pb
    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.ops import homography as H
    from calibration_tpu.parallel import batched

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    opts = OptimOptions(max_iterations=50, compute_covariance=False)

    for b in batches:
        _, src, dst = pb.homography_problems(b)
        make = lambda k, b=b: pb.homography_problems(b, seed=repeat_seed(11, k))[1:3]

        # (a) seed share: DLT-only dispatch
        seed_fn = jax.jit(lambda s, d: H.estimate_homography_dlt(s, d))
        hm_seed, dt_seed = timed_batch(seed_fn, (jnp.asarray(src), jnp.asarray(dst)),
                                       lambda k: tuple(jnp.asarray(a) for a in make(k)),
                                       repeats=repeats)
        print(f"B={b} seed-only: {b/dt_seed:.0f} solves/s ({dt_seed*1e3:.1f} ms)")

        # (b) single-phase reference + linearization distribution
        fn1 = lambda s, d: batched.homography_batch(s, d, options=opts, two_phase=False)
        (lm, hm, _, _), dt1 = timed_batch(fn1, (src, dst), make, repeats=repeats)
        lin = np.asarray(lm.linearizations)
        cost_ref = np.asarray(lm.cost)
        print(
            f"B={b} single-phase: {b/dt1:.0f} solves/s | lin min/med/p90/max = "
            f"{lin.min()}/{np.median(lin):.0f}/{np.percentile(lin, 90):.0f}/{lin.max()}"
        )

        # (c) schedule sweep through the public API (phased)
        schedules = {"cap5_k8": 5, "cap4_k8": 4, "cap6_k8": 6}
        for name, cap in schedules.items():
            batched.HOMOG_PHASE_CAP = cap
            fn = lambda s, d: batched.homography_batch(s, d, options=opts, two_phase=True)
            (lm_s, _, _, _), dt = timed_batch(fn, (src, dst), make, repeats=repeats)
            dcost = np.abs(np.asarray(lm_s.cost) - cost_ref) / np.maximum(cost_ref, 1e-300)
            print(
                f"B={b} {name}: {b/dt:.0f} solves/s | dcost_rel med/max = "
                f"{np.median(dcost):.2e}/{dcost.max():.2e}"
            )
        batched.HOMOG_PHASE_CAP = 5


if __name__ == "__main__":
    main()
