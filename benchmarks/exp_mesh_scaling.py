"""Mesh-scaling validation on the virtual CPU mesh (VERDICT round-2 next #6).

What this CAN establish on this host: the sharded program really partitions
(each device holds exactly B/n problems — verified via addressable_shards),
the numerics are mesh-size invariant, and the sharding machinery adds no
meaningful overhead as the mesh grows. What it CANNOT establish: real
throughput scaling — the "8 devices" are XLA host devices multiplexed onto
ONE vCPU, so wall time is roughly flat by construction. True scaling needs
real chips; the geometry validated here (1-D batch mesh, zero intra-solve
collectives) is exactly the layout that rides ICI bandwidth-free on a pod
(parallel/sharding.py docstring claim under test).

Usage: python benchmarks/exp_mesh_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from benchmarks import problems as pb
    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.parallel import batched, sharding as sh

    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, f"need 8 virtual CPU devices, have {len(cpus)}"

    b = int(os.environ.get("MESH_SCALE_BATCH", "64"))
    hs, src, dst = pb.homography_problems(b, seed=41)
    opts = OptimOptions(max_iterations=50, compute_covariance=False)

    ref = None
    rows = []
    for n in (1, 2, 4, 8):
        mesh = sh.make_mesh(cpus[:n])
        # geometry: each device holds exactly b/n problems
        placed, _ = batched._maybe_shard((src, dst), mesh)
        shards = placed[0].addressable_shards
        shapes = sorted(s.data.shape[0] for s in shards)
        assert len(shards) == n and shapes == [b // n] * n, (n, shapes)

        out, hm, _, _ = batched.homography_batch(src, dst, options=opts, mesh=mesh)
        hm = np.asarray(jax.block_until_ready(hm))
        if ref is None:
            ref = hm
        else:
            np.testing.assert_allclose(hm, ref, atol=1e-12)

        times = []
        for k in range(3):
            _, s2, d2 = pb.homography_problems(b, seed=100 + 10 * n + k)
            t0 = time.time()
            r = batched.homography_batch(s2, d2, options=opts, mesh=mesh)
            jax.block_until_ready(r[1])
            times.append(time.time() - t0)
        dt = min(times)
        rows.append((n, dt))
        print(f"mesh={n}: shard_shapes ok ({b}//{n}={b//n}/device), "
              f"numerics ok, best of 3: {dt:.3f}s ({b/dt:.1f} solves/s)")

    base = rows[0][1]
    for n, dt in rows:
        print(f"relative time mesh={n}: {dt/base:.2f}x of 1-device "
              f"(1 vCPU host: flat == sharding adds no overhead; real "
              f"scaling requires real chips)")


if __name__ == "__main__":
    main()
