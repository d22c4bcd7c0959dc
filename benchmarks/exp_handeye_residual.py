"""A/B the hand-eye rotation residual: algebraic quaternion-difference
("quat", transcendental-free LM inner loop) vs the reference's log-map
("log", handeyeresidual.h:33-47).

The round-3 verdict pinned config 4's 4.9x at "transcendental-bound:
log_so3 per pair per LM iteration on the VPU in f64" — the quat residual
removes every transcendental from the loop (pair quaternions precomputed
once; residual + analytic Jacobian are pure polynomial algebra; same
minimum to O(theta^3), gated by
tests/test_lm_solvers.py::test_handeye_quat_residual_same_minimum).

Usage: python benchmarks/exp_handeye_residual.py [batch]
Timing via bench_all.timed_batch (distinct-data + replay guard).
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

    from bench_all import repeat_seed, timed_batch
    from benchmarks import problems as pb
    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.parallel import batched

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)
    g_gt, bg, ct = pb.handeye_problems(batch)
    opts = OptimOptions(max_iterations=50, compute_covariance=False)

    results = {}
    for arm in ("log", "quat"):
        fn = lambda a, c: batched.handeye_batch(a, c, options=opts, rot_residual=arm)
        (out, pose, _, _), dt = timed_batch(
            fn, (bg, ct),
            lambda k: pb.handeye_problems(batch, seed=repeat_seed(171, k))[1:3],
        )
        pose = np.asarray(pose)
        iters = np.asarray(out.iterations)
        lins = np.asarray(out.linearizations)
        rot_err = max(
            _rot_err_deg(pose[i], g_gt[i]) for i in range(min(8, batch))
        )
        results[arm] = (batch / dt, pose)
        print(
            f"[{arm}] {batch / dt:.1f} rigs/s (dt {dt:.3f}s) | iters med "
            f"{np.median(iters):.0f} max {iters.max()} | linearizations med "
            f"{np.median(lins):.0f} max {lins.max()} | worst rot err vs GT "
            f"{rot_err:.2e} deg",
            file=sys.stderr,
        )

    dq = max(
        _rot_err_deg(results["quat"][1][i], results["log"][1][i])
        for i in range(batch)
    )
    dt_m = max(
        float(np.abs(results["quat"][1][i][:3, 3] - results["log"][1][i][:3, 3]).max())
        for i in range(batch)
    )
    print(
        f"quat-vs-log solution delta: rot {dq:.2e} deg, trans {dt_m:.2e} m | "
        f"speedup {results['quat'][0] / results['log'][0]:.3f}x",
        file=sys.stderr,
    )


def _rot_err_deg(a, b):
    c = a[:3, :3] @ b[:3, :3].T
    return float(np.degrees(np.arccos(np.clip((np.trace(c) - 1) / 2, -1, 1))))


if __name__ == "__main__":
    main()
