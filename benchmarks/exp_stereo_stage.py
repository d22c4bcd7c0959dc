"""Config-3 (stereo extrinsics) stage decomposition + phase-schedule sweep.

The bench row times extrinsics_batch on precomputed seeds, so the wall time
IS the LM refine; the levers are batch width and the phased-compaction
schedule. This experiment publishes (a) the linearization distribution that
justifies the schedule (the vmapped while_loop pays batch-MAX at full
width), and (b) a replay-guarded throughput sweep over batch x schedule,
including the single-phase reference arm. Equivalence is pinned per arm by
final-cost agreement with the single-phase run (same-minimum criterion).

Usage: python benchmarks/exp_stereo_stage.py [batches] [repeats]
  batches: comma list, default "128,192,256"
Env: BENCH_SALT pins the repeat-seed salt.
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
    batches = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "128,192,256").split(",")]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax

    from bench_all import repeat_seed, timed_batch
    from benchmarks import problems as pb
    from calibration_tpu.optim import ExtrinsicOptions, OptimOptions
    from calibration_tpu.parallel import batched

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    opts = ExtrinsicOptions(core=OptimOptions(max_iterations=50, compute_covariance=False))
    unpack = lambda q: (q["obj"], q["uv"], q["intr0"], q["c0"], q["r0"])

    for b in batches:
        p = pb.stereo_problems(b)
        make = lambda k, b=b: unpack(pb.stereo_problems(b, seed=repeat_seed(13, k)))

        # single-phase reference: throughput + the linearization distribution
        fn1 = lambda o, u, i0, c0, r0: batched.extrinsics_batch(
            o, u, i0, c0, r0, opts=opts, two_phase=False
        )
        (lm, _, _, _, _, _), dt1 = timed_batch(fn1, unpack(p), make, repeats=repeats)
        lin = np.asarray(lm.linearizations)
        cost_ref = np.asarray(lm.cost)
        print(
            f"B={b} single-phase: {b/dt1:.1f} rigs/s | lin min/med/p90/max = "
            f"{lin.min()}/{np.median(lin):.0f}/{np.percentile(lin, 90):.0f}/{lin.max()}"
        )

        schedules = {
            "cap12_k4": ((12, None), (38, max(b // 4, 1))),
            "cap8_k4": ((8, None), (42, max(b // 4, 1))),
            "cap10_k8": ((10, None), (40, max(b // 8, 1))),
            "cap6_3ph": ((6, None), (10, max(b // 4, 1)), (34, max(b // 16, 1))),
            # round-2 refinement arms (2026-08-21, B=128 same-session vs
            # single-phase 172.9): cap5_half 232.6 > cap6_3ph 214.7 >
            # cap4_half 200.3 > cap5 quarter-width 176.3 (the >k unconverged
            # fallback trips when the cap sits AT the median and the
            # continuation is only B/4) — cap5_half is the production
            # default (parallel/batched.py::extrinsics_batch)
            "cap5_half": ((5, None), (8, max(b // 2, 1)), (37, max(b // 16, 1))),
            "cap4_half": ((4, None), (9, max(b // 2, 1)), (37, max(b // 16, 1))),
        }
        for name, sched in schedules.items():
            # _extrinsics_batch_phased_jit signature:
            # (obj, uv, mask, intrs, c0, r0, opts, model_name, solver,
            #  analytic, schedule)
            fn = lambda o, u, i0, c0, r0, sched=sched: (
                batched._extrinsics_batch_phased_jit(
                    jax.numpy.asarray(o), jax.numpy.asarray(u),
                    jax.numpy.ones(o.shape[:-1]),
                    jax.numpy.asarray(i0), jax.numpy.asarray(c0),
                    jax.numpy.asarray(r0),
                    opts, "pinhole_brown_conrady", "schur", False, sched,
                )
            )
            try:
                (lm_s, _, _, _, _, _), dt = timed_batch(fn, unpack(p), make, repeats=repeats)
            except Exception as e:  # noqa: BLE001 — sweep arm, report and move on
                print(f"B={b} {name}: FAILED {type(e).__name__}: {e}")
                continue
            dcost = np.abs(np.asarray(lm_s.cost) - cost_ref) / np.maximum(cost_ref, 1e-300)
            print(
                f"B={b} {name}: {b/dt:.1f} rigs/s | dcost_rel med/max = "
                f"{np.median(dcost):.2e}/{dcost.max():.2e}"
            )


if __name__ == "__main__":
    main()
