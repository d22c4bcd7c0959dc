"""A/B sweep of the LM initial damping (CALIB_LM_MU_INIT) on the flagship
config-2 problem, measured in LINEARIZATION and TRIAL counts —
backend-independent, so it runs meaningfully on CPU while wall-clock tuning
needs the chip. Linearizations (jacfwd+gram, ~60% of a B=256 step per
benchmarks/exp_profile_iter.py) dominate cost, so median linearizations is
the primary throughput proxy; trials - linearizations counts rejected
damping re-solves (each a cheap Schur re-solve + one residual eval).

Also reports final-cost parity vs the 1e-4 baseline so a faster arm is only
adopted at the same minimum.

Usage: python benchmarks/exp_mu_init.py [batch] [mu ...]
  (spawns one subprocess per mu — _MU_INIT is read at import time)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_MUS = ["1e-2", "1e-4", "1e-6", "1e-8"]

_CHILD = """
import json, os, sys
import numpy as np
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
from bench import make_problems
from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
from calibration_tpu.optim.intrinsics import optimize_intrinsics_device
from calibration_tpu.ops import intrinsics_linear

batch = %(batch)d
obj, uv, poses_gt, intr_gt = make_problems(batch)
opts = IntrinsicsOptimOptions(
    core=OptimOptions(max_iterations=60, epsilon=1e-9, compute_covariance=False)
)

@jax.jit
def solve(obj, uv):
    # same seed pattern as bench.py::solve
    mask = jnp.ones(obj.shape[:-1], obj.dtype)
    seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
    seed_kmtx = seed.kmtx.at[..., 4].set(0.0)
    intr0 = jnp.concatenate(
        [seed_kmtx, jnp.zeros(seed_kmtx.shape[:-1] + (5,), obj.dtype)], axis=-1
    )
    fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
        o, u, i0, p0, mask=m, opts=opts
    )
    out, intr, poses, view_errors, cov, cov_ok = jax.vmap(fn)(
        obj, uv, mask, intr0, seed.c_se3_t
    )
    return intr, out.cost, out.iterations, out.linearizations, view_errors

intr, cost, iters, lins, ve = (
    np.asarray(a) for a in solve(jnp.asarray(obj), jnp.asarray(uv))
)
print(json.dumps({
    "mu": os.environ.get("CALIB_LM_MU_INIT", "1e-4"),
    "iters_median": float(np.median(iters)),
    "iters_mean": float(iters.mean()),
    "iters_max": int(iters.max()),
    "lin_median": float(np.median(lins)),
    "lin_mean": float(lins.mean()),
    "lin_max": int(lins.max()),
    "cost_sum": float(np.sum(cost)),
    "rms": float(np.sqrt(np.mean(ve ** 2))),
}))
"""


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mus = sys.argv[2:] or DEFAULT_MUS
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for mu in mus:
        env = dict(os.environ, CALIB_LM_MU_INIT=mu)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"root": root, "batch": batch}],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if out.returncode != 0 or not line.startswith("{"):
            print(f"mu={mu}: FAILED rc={out.returncode}\n{out.stderr[-2000:]}")
            continue
        rec = json.loads(line)
        results.append(rec)
        print(
            f"mu={mu}: trials med/mean/max = {rec['iters_median']:.0f}/"
            f"{rec['iters_mean']:.2f}/{rec['iters_max']}  "
            f"linearizations med/mean/max = {rec['lin_median']:.0f}/"
            f"{rec['lin_mean']:.2f}/{rec['lin_max']}  "
            f"cost_sum={rec['cost_sum']:.12e}  rms={rec['rms']:.4f}px"
        )
    base = next((r for r in results if float(r["mu"]) == 1e-4), None)
    if base:
        for r in results:
            rel = abs(r["cost_sum"] - base["cost_sum"]) / max(abs(base["cost_sum"]), 1e-300)
            print(
                f"mu={r['mu']}: cost parity vs 1e-4 rel={rel:.3e} "
                f"({'same minimum' if rel < 1e-7 else 'DIFFERENT MINIMUM'})"
            )


if __name__ == "__main__":
    main()
