"""Config-5 (bundle) phase-schedule + batch sweep (round-5 verdict item 8:
bundle to >= 10x vs the pinned 39.1/s floor, i.e. >= 391 rigs/s).

Bundle's unknowns are global (one g_se3_c + one b_se3_t per rig — no Schur
blocks), so the levers are batch width and the phased-compaction schedule.
Single-phase reference arm publishes the linearization distribution; each
phased arm reports throughput + final-cost parity vs the reference.

Usage: python benchmarks/exp_bundle_stage.py [batches] [repeats]
  batches: comma list, default "64,128,256"
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
    batches = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "64,128,256").split(",")]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax

    from bench_all import repeat_seed, timed_batch
    from benchmarks import problems as pb
    from calibration_tpu.optim import BundleOptions, OptimOptions
    from calibration_tpu.parallel import batched

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    opts = BundleOptions(core=OptimOptions(max_iterations=50, compute_covariance=False))

    for b in batches:
        p = pb.bundle_problems(b)
        o = p["bg"].shape[1]
        cam_idx = np.zeros((b, o), int)
        unpack = lambda q, b=b: (
            q["obj"], q["uv"], q["bg"],
            np.tile(q["intr"][None, None], (b, 1, 1)), q["g0"][:, None], q["b0"],
        )
        make = lambda k, b=b: unpack(pb.bundle_problems(b, seed=repeat_seed(19, k)))

        fn1 = lambda obj, uv, bg, intrs, g0, b0: batched.bundle_batch(
            obj, uv, bg, cam_idx, intrs, g0, b0, opts=opts, two_phase=False
        )
        (lm, _, _, _, _, _), dt1 = timed_batch(fn1, unpack(p), make, repeats=repeats)
        lin = np.asarray(lm.linearizations)
        cost_ref = np.asarray(lm.cost)
        print(
            f"B={b} single-phase: {b/dt1:.1f} rigs/s | lin min/med/p90/max = "
            f"{lin.min()}/{np.median(lin):.0f}/{np.percentile(lin, 90):.0f}/{lin.max()}"
        )

        for name, cap in {"cap12_k4": 12, "cap8_k4": 8, "cap6_k4": 6}.items():
            batched.BUNDLE_PHASE_CAP = cap
            fn = lambda obj, uv, bg, intrs, g0, b0: batched.bundle_batch(
                obj, uv, bg, cam_idx, intrs, g0, b0, opts=opts, two_phase=True
            )
            (lm_s, _, _, _, _, _), dt = timed_batch(fn, unpack(p), make, repeats=repeats)
            dcost = np.abs(np.asarray(lm_s.cost) - cost_ref) / np.maximum(cost_ref, 1e-300)
            print(
                f"B={b} {name}: {b/dt:.1f} rigs/s | dcost_rel med/max = "
                f"{np.median(dcost):.2e}/{dcost.max():.2e}"
            )
        batched.BUNDLE_PHASE_CAP = 12


if __name__ == "__main__":
    main()
