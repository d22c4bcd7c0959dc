"""Linearization-count spread for the stereo (config 3) and bundle
(config 5) bench problems — sizes the phased-compaction win (the vmapped
while_loop pays batch-MAX linearizations at full width; see
parallel/batched.py::_intrinsics_batch_phased_jit).

Usage: python benchmarks/exp_iter_spread.py [batch]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stats(name, lin, it):
    lin = np.asarray(lin)
    q = np.percentile(lin, [0, 50, 75, 90, 100]).astype(int)
    print(
        f"{name}: linearizations min/med/p75/p90/max = {q[0]}/{q[1]}/{q[2]}/{q[3]}/{q[4]}"
        f"  (iters max {int(np.max(it))})"
    )


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from benchmarks import problems as pb
    from calibration_tpu.optim import (
        BundleOptions,
        ExtrinsicOptions,
        OptimOptions,
    )
    from calibration_tpu.parallel import batched

    p = pb.stereo_problems(batch)
    opts = ExtrinsicOptions(core=OptimOptions(max_iterations=50, compute_covariance=False))
    out, *_ = batched.extrinsics_batch(
        p["obj"], p["uv"], p["intr0"], p["c0"], p["r0"], opts=opts
    )
    stats("stereo", np.asarray(out.linearizations), np.asarray(out.iterations))

    q = pb.bundle_problems(batch)
    o = q["bg"].shape[1]
    cam_idx = np.zeros((batch, o), int)
    bopts = BundleOptions(core=OptimOptions(max_iterations=50, compute_covariance=False))
    out_b, *_ = batched.bundle_batch(
        q["obj"], q["uv"], q["bg"], cam_idx,
        np.tile(q["intr"][None, None], (batch, 1, 1)), q["g0"][:, None], q["b0"],
        opts=bopts,
    )
    stats("bundle", np.asarray(out_b.linearizations), np.asarray(out_b.iterations))


if __name__ == "__main__":
    main()
