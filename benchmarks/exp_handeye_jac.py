"""A/B: hand-eye AX=XB LM with the hand-derived analytic Jacobian vs jacfwd,
after fmath gained exact custom JVPs (d atan2, d sincos closed-form).

Round-2 measured analytic 82.0 vs jacfwd 77.3 rigs/s at B=256 — but that
jacfwd differentiated the fdlibm polynomial chains term by term. With the
custom rules the jacfwd graph through log_so3/exp_so3 shrinks drastically;
this re-decides the default (optim/handeye.py analytic_jac).

Usage: python benchmarks/exp_handeye_jac.py  (TPU; B from HE_BATCH, default 256)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks import problems as pb
    from bench_all import _fingerprint, repeat_seed
    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.optim.handeye import estimate_and_optimize_handeye

    b = int(os.environ.get("HE_BATCH", "256"))
    opts = OptimOptions(max_iterations=50, compute_covariance=False)

    @functools.partial(jax.jit, static_argnames=("analytic",))
    def solve(bg, ct, analytic):
        fn = lambda a, c: estimate_and_optimize_handeye(
            a, c, options=opts, analytic_jac=analytic
        )
        return jax.vmap(fn)(bg, ct)

    results = {}
    for analytic in (True, False):
        label = "analytic" if analytic else "jacfwd"
        _, bg, ct = pb.handeye_problems(b, seed=101)
        t0 = time.time()
        out = solve(jnp.asarray(bg), jnp.asarray(ct), analytic)
        jax.block_until_ready(out)
        print(f"[{label}] compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
        base_fp = _fingerprint(out)
        times = []
        att = 0
        while len(times) < 3 and att < 9:
            att += 1
            _, bg, ct = pb.handeye_problems(b, seed=repeat_seed(301 + att, att))
            t0 = time.time()
            r = solve(jnp.asarray(bg), jnp.asarray(ct), analytic)
            jax.block_until_ready(r)
            dt = time.time() - t0
            if _fingerprint(r) == base_fp:
                print(f"[{label}] repeat {att}: {dt:.4f}s REPLAY — dropped", file=sys.stderr)
                continue
            times.append(dt)
        dt = min(times)
        results[label] = b / dt
        print(f"[{label}] repeats {['%.4f' % t for t in times]} -> {b / dt:.1f} rigs/s")

    # same-minimum check between the two arms on one dataset
    _, bg, ct = pb.handeye_problems(8, seed=77)
    pa = np.asarray(solve(jnp.asarray(bg), jnp.asarray(ct), True)[1])
    pj = np.asarray(solve(jnp.asarray(bg), jnp.asarray(ct), False)[1])
    print(f"max |pose_analytic - pose_jacfwd| = {np.abs(pa - pj).max():.3e}")
    print(results)


if __name__ == "__main__":
    main()
