"""Headline benchmark: batched planar-intrinsics calibration throughput.

BASELINE.md config 2: Zhang planar intrinsics, 10 views x 8x11 grid,
Brown-Conrady distortion, full LM refinement. The reference solves one
problem at a time with Ceres on CPU; the TPU-native path solves a whole
batch per dispatch (linear seed + LM refine in one jitted program).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}
vs_baseline = throughput vs a measured scipy.least_squares (TRF, the
CPU/Ceres stand-in available in this image) solving the same problems
sequentially on the host CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def _np_exp_so3(w):
    th = np.linalg.norm(w, axis=-1, keepdims=True)
    th = np.where(th < 1e-12, 1.0, th)
    a = w / th
    th = th[..., 0]
    K = np.zeros(w.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -a[..., 2], a[..., 1]
    K[..., 1, 0], K[..., 1, 2] = a[..., 2], -a[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -a[..., 1], a[..., 0]
    s = np.sin(th)[..., None, None]
    c = (1 - np.cos(th))[..., None, None]
    return np.eye(3) + s * K + c * (K @ K)


def make_problems(batch, views=10, rows=8, cols=11, noise=0.2, seed=7):
    import jax.numpy as jnp

    from calibration_tpu.models import pinhole

    rng = np.random.default_rng(seed)
    n = rows * cols
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    obj = np.stack([xs.ravel() * 0.03, ys.ravel() * 0.03], -1)
    obj = obj - obj.mean(0)

    kmtx = np.array([600.0, 610.0, 320.0, 240.0, 0.0])
    dist = np.array([-0.15, 0.05, 0.0, 1e-4, -2e-4])
    intr = np.concatenate([kmtx, dist])

    ang = 2 * np.pi * np.arange(views)[None, :] / views + 0.05 * np.arange(batch)[:, None]
    w = np.stack(
        [0.3 * np.cos(ang), 0.3 * np.sin(ang), 0.1 * np.sin(2 * ang)], axis=-1
    )
    t = np.stack(
        [0.06 * np.cos(ang), 0.06 * np.sin(ang), 0.9 + 0.08 * np.sin(ang)], axis=-1
    )
    poses = np.zeros((batch, views, 4, 4))
    poses[..., :3, :3] = _np_exp_so3(w)
    poses[..., :3, 3] = t
    poses[..., 3, 3] = 1.0

    obj3 = np.concatenate([obj, np.zeros((n, 1))], -1)
    pts_c = np.einsum("bvij,nj->bvni", poses[:, :, :3, :3], obj3) + poses[:, :, None, :3, 3]
    uv = np.asarray(pinhole.project(jnp.asarray(intr), jnp.asarray(pts_c)))
    uv = uv + rng.normal(0, noise, uv.shape)
    obj_b = np.tile(obj[None, None], (batch, views, 1, 1))
    return obj_b, uv, poses, intr


def tpu_throughput(obj, uv, repeats=3, make=None):
    """Throughput on the base (obj, uv) problem set; accuracy outputs come
    from the base set, but each TIMED repeat runs a genuinely distinct
    same-shape dataset built by ``make(k)`` -> (obj, uv). The remote
    execution layer memoizes identical (executable, input) pairs and
    1e-9 eps-perturbations proved unreliable (a memo hit returned a stereo
    batch in 1.4ms vs the real 800ms), so distinct data is the only honest
    timing. make=None falls back to eps perturbation (single-chip smoke)."""
    import jax
    import jax.numpy as jnp

    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.optim.intrinsics import optimize_intrinsics_device
    from calibration_tpu.ops import intrinsics_linear

    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=40, epsilon=1e-9, compute_covariance=True)
    )
    precision = os.environ.get("BENCH_PRECISION", "f64")
    # auto = jacfwd (measured winner at every size on this chip; see
    # parallel/batched.py::ANALYTIC_JAC_MAX_BATCH); BENCH_ANALYTIC=1 forces
    # the hand-derived-Jacobian variant for A/B runs
    env = os.environ.get("BENCH_ANALYTIC", "auto")
    from calibration_tpu.parallel import batched
    from calibration_tpu.parallel.batched import _resolve_analytic

    analytic = _resolve_analytic(None if env == "auto" else env != "0", obj.shape[0])
    # BENCH_TWO_PHASE=0 for single-phase A/B runs; default is the two-phase
    # compacted solve (batch-max linearizations at full width only up to
    # CAP_A; the unconverged tail re-batches at quarter width — see
    # parallel/batched.py::_intrinsics_batch_phased_jit)
    two_phase = os.environ.get("BENCH_TWO_PHASE", "1") != "0"
    b = obj.shape[0]

    @jax.jit
    def solve(obj, uv):
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
        seed_kmtx = seed.kmtx.at[..., 4].set(0.0)  # skew frozen at zero
        intr0 = jnp.concatenate(
            [seed_kmtx, jnp.zeros(seed_kmtx.shape[:-1] + (5,), obj.dtype)], axis=-1
        )
        if two_phase:
            out, intr, poses, view_errors, cov, cov_ok = (
                batched._intrinsics_batch_phased_jit(
                    obj, uv, mask, intr0, seed.c_se3_t, opts,
                    "pinhole_brown_conrady", precision, analytic,
                    batched.phase_schedule("pinhole_brown_conrady", b, opts),
                )
            )
        else:
            fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
                o, u, i0, p0, mask=m, opts=opts, precision=precision,
                analytic_jac=analytic,
            )
            out, intr, poses, view_errors, cov, cov_ok = jax.vmap(fn)(
                obj, uv, mask, intr0, seed.c_se3_t
            )
        return intr, out.cost, view_errors, cov

    obj_j = jnp.asarray(obj)
    uv_j = jnp.asarray(uv)
    t0 = time.time()
    intr, cost, view_errors, cov = solve(obj_j, uv_j)
    intr.block_until_ready()
    compile_and_first = time.time() - t0
    print(f"[bench] compile+first: {compile_and_first:.1f}s", file=sys.stderr)
    intr_base, rms_base = np.asarray(intr), np.asarray(view_errors)

    # Replay guard (see bench_all.timed_batch): the execution layer has been
    # observed replaying the warmup's output bit-for-bit for same-shape calls
    # on genuinely DIFFERENT data (1.5ms vs the real 3.1s). Drop any repeat
    # whose output equals the warmup's bits.
    from bench_all import _fingerprint

    base_fp = _fingerprint(intr)
    times = []
    attempts = 0
    while len(times) < repeats and attempts < 3 * repeats:
        attempts += 1
        if make is not None:
            obj_r, uv_r = (jnp.asarray(a) for a in make(1000 * attempts + len(times) + 1))
        else:
            obj_r, uv_r = obj_j, uv_j + attempts * 1e-9
        t0 = time.time()
        out_i = solve(obj_r, uv_r)
        out_i[0].block_until_ready()
        dt_i = time.time() - t0
        if _fingerprint(out_i[0]) == base_fp:
            print(f"[bench] repeat {attempts}: {dt_i:.4f}s REPLAY — dropped", file=sys.stderr)
            continue
        times.append(dt_i)
    if not times:
        raise RuntimeError("every timed repeat was an execution-layer replay")
    print(f"[bench] repeats: {['%.4fs' % t for t in times]}", file=sys.stderr)
    dt = min(times)
    batch = obj.shape[0]
    rms = float(np.sqrt(np.mean(rms_base**2)))
    print(f"[bench] tpu: {batch} solves in {dt:.3f}s, mean view RMS {rms:.4f}px", file=sys.stderr)
    return batch / dt, rms, intr_base


def cpu_baseline_throughput(obj, uv, poses0, intr_gt, max_problems=8, passes=6):
    """Sequential Ceres-class CPU stand-in: scipy.optimize.least_squares
    (TRF) with the hand-derived ANALYTIC Jacobian from
    benchmarks/cpu_baseline.py (verified against finite differences in
    tests/test_cpu_baseline.py). Round-1's finite-difference stand-in
    understated the baseline ~10x; this is the honest multiplier.

    The floor is a thick sample (8 problems x 6 passes, round-3 verdict:
    the old 4x4 sample produced a 19.4-vs-30.5/s spread between sessions);
    returns (solves/sec from the BEST pass — the fastest the host ever went,
    i.e. the most conservative multiplier — plus the full pass list and the
    median, all of which land in the output JSON for auditability)."""
    try:
        from benchmarks import cpu_baseline as cb
    except Exception:
        return None

    b = min(max_problems, obj.shape[0])
    # same seed perturbation as bench_all.py::bench_intrinsics so the two
    # harnesses report comparable CPU numbers
    pert = intr_gt + np.array([8.0, -6.0, 4.0, -3.0, 0, 0, 0, 0, 0, 0])
    # best-of-N passes: a single pass under transient host load (e.g. the
    # remote-compile service still draining) understates the baseline and
    # overstates vs_baseline — observed 4.1/s vs 24/s for identical code,
    # and a 2.97s vs 0.39s pass pair even with best-of-2 (r3 chip session)
    times = []
    for _ in range(passes):
        t0 = time.time()
        for i in range(b):
            x0 = cb.intrinsics_x0(pert, poses0[i])
            cb.solve_intrinsics_cpu(obj[i], uv[i], x0)
        times.append(time.time() - t0)
    dt = min(times)
    print(
        f"[bench] cpu baseline (analytic-jac TRF): {b} solves, best pass {dt:.2f}s "
        f"(passes: {', '.join(f'{t:.2f}' for t in times)})",
        file=sys.stderr,
    )
    return {
        "solves_per_sec": b / dt,
        "solves_per_sec_median": b / float(np.median(times)),
        "problems": b,
        "passes_sec": [round(t, 4) for t in times],
    }


def lm_trace_diagnostic(obj, uv, poses, intr_gt):
    """BENCH_TRACE=1: per-iteration LM cost curve of bench problem 0 via
    utils.profiling.lm_cost_trace (scans the exact lm_core step, so the
    curve is the real trajectory)."""
    import jax.numpy as jnp

    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.optim import intrinsics as oi
    from calibration_tpu.optim.blocks import pack_intr_quats_trans, poses_to_quat_tran
    from calibration_tpu.utils.profiling import lm_cost_trace

    v = obj.shape[1]
    intr0 = jnp.asarray(np.concatenate([intr_gt[:5] + [4, -3, 2, -1, 0], np.zeros(5)]))
    quats, trans = poses_to_quat_tran(jnp.asarray(poses[0]))
    x0 = pack_intr_quats_trans(intr0, quats, trans)
    manifold = oi.make_manifold(10, v)
    mask = jnp.ones(obj.shape[1:-1])
    res = lambda x: oi._residual_flat(
        oi.PINHOLE, x, jnp.asarray(obj[0]), jnp.asarray(uv[0]), mask, 10, v
    )
    out, costs = lm_cost_trace(res, x0, manifold, options=OptimOptions(max_iterations=15))
    print(
        "[bench] LM cost trace (problem 0): "
        + " ".join(f"{c:.4g}" for c in np.asarray(costs)),
        file=sys.stderr,
    )


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    import jax

    print(f"[bench] backend: {jax.default_backend()}, devices: {jax.devices()}", file=sys.stderr)
    obj, uv, poses, intr_gt = make_problems(batch)
    if os.environ.get("BENCH_TRACE"):
        lm_trace_diagnostic(obj, uv, poses, intr_gt)
    # repeat seeds salted per process: the execution-layer memo cache
    # persists across runs (see bench_all.repeat_seed)
    from bench_all import repeat_seed

    # CPU floor FIRST, on an idle host: measuring it after the TPU section
    # exposes it to compile-service/dispatch aftershocks (the 2.97s-vs-0.39s
    # pass spread seen when it ran second), which understates the baseline
    # and overstates vs_baseline.
    cpu = cpu_baseline_throughput(obj, uv, poses, intr_gt)

    throughput, rms, intr = tpu_throughput(
        obj, uv, make=lambda k: make_problems(batch, seed=repeat_seed(7, k))[:2]
    )

    # vs_baseline divides by max(today's floor, pinned floor) so the
    # multiplier can only improve when the TPU number improves (BASELINE.json
    # "floors" holds the strongest floor ever measured; round-5 verdict 1)
    from bench_all import PINNED_FLOORS

    pin = PINNED_FLOORS.get("batched_planar_intrinsics_solves_per_sec", {})
    pinned = float(pin.get("cpu_solves_per_sec") or 0.0)
    floor = max(cpu["solves_per_sec"], pinned) if cpu else pinned
    vs_baseline = (throughput / floor) if floor > 0 else 1.0

    fx_err = float(np.mean(np.abs(intr[:, 0] - intr_gt[0])))
    print(f"[bench] mean |fx err|: {fx_err:.4f}px-equivalent", file=sys.stderr)
    record = {
        "metric": "batched_planar_intrinsics_solves_per_sec",
        "value": round(throughput, 3),
        "unit": "solves/sec",
        "vs_baseline": round(vs_baseline, 3),
    }
    if cpu:
        # auditable floor: the pass list + per-pass throughput that produced
        # vs_baseline (round-3 verdict item 2)
        record["cpu_solves_per_sec"] = round(cpu["solves_per_sec"], 3)
        record["cpu_solves_per_sec_median"] = round(cpu["solves_per_sec_median"], 3)
        record["cpu_problems"] = cpu["problems"]
        record["cpu_passes_sec"] = cpu["passes_sec"]
    record["cpu_floor_pinned"] = pinned
    record["cpu_floor_used"] = round(floor, 3)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
