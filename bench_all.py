"""All five BASELINE.md benchmark configs: TPU batched throughput vs the
sequential Ceres-class CPU baseline (benchmarks/cpu_baseline.py — scipy TRF
with analytic/autodiff Jacobians), plus accuracy-parity deltas computed on
the SAME problems with the SAME initial guesses.

Prints one JSON line per config and writes BENCH_ALL.json. The headline
single-line bench (driver contract) remains bench.py (config 2).

  BENCH_CONFIGS=1,3 python bench_all.py   # subset
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

from benchmarks import cpu_baseline as cb
from benchmarks import problems as pb


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# The memo cache lives in the long-running execution service and persists
# ACROSS benchmark processes, so timed-repeat datasets must differ between
# runs too, not just within one run — salt the repeat seeds per process.
# (The base dataset keeps its fixed seed so parity checks stay reproducible.)
RUN_SALT = int(os.environ.get("BENCH_SALT", str(os.getpid() * 1000 + int(time.time()) % 1000)))


def repeat_seed(base, k):
    """Seed for timed repeat k: differs from every base seed and from other
    runs' repeats (RUN_SALT is per-process unless BENCH_SALT pins it)."""
    return 1000 + base + RUN_SALT % 1_000_000_007 + k


def _fingerprint(tree):
    """Bit-level hash of every array leaf in a result pytree."""
    import hashlib

    import jax

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def timed_batch(fn, args, make_args, repeats=3):
    """Compile+warmup on the base ``args`` (whose result is returned for the
    parity checks), then min wall time over ``repeats`` runs on DISTINCT
    same-shape datasets from ``make_args(k)``.

    Distinct data is NECESSARY but NOT SUFFICIENT: the remote execution
    layer memoizes (executable, input) pairs AND has been observed (round 3,
    hand-eye) replaying the warmup's result for same-shape calls with
    genuinely different input values — 256 LM solves "ran" in 1.5ms vs the
    real 3.1s, three salted repeats in a row. A replay returns the warmup
    output bit-for-bit, so every repeat's output is fingerprinted and
    repeats whose outputs are bit-identical to the warmup's are dropped as
    replays (distinct noise in distinct datasets makes real outputs differ).
    If every repeat is a replay, each is retried once on yet-another
    dataset; if that still yields nothing honest, the run aborts rather
    than report a fantasy number."""
    import jax

    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    _log(f"  compile+first: {time.time() - t0:.1f}s")
    base_fp = _fingerprint(out)
    times = []
    k, attempts = 1, 0
    while len(times) < repeats and attempts < 3 * repeats:
        attempts += 1
        a = make_args(1000 * attempts + k)
        t0 = time.time()
        r = fn(*a)
        jax.block_until_ready(r)
        dt = time.time() - t0
        if _fingerprint(r) == base_fp:
            _log(f"  repeat {attempts}: {dt:.4f}s REPLAY (output == warmup bits) — dropped")
            continue
        times.append(dt)
        k += 1
    if not times:
        raise RuntimeError(
            "every timed repeat was an execution-layer replay; no honest timing"
        )
    _log(f"  repeats: {['%.4fs' % t for t in times]}")
    return out, min(times)


def timed_cpu(solve_one, n, passes=4):
    """Best-of-``passes`` sequential CPU floor. A single pass on this shared
    1-vCPU host can be inflated several-x by transient load (observed 2.97s
    vs 0.39s for identical solves), which silently *overstates* vs_baseline;
    the min over repeated passes is the honest sequential capability.
    Returns (results, best_time, per_pass_times) — the pass list lands in
    every row (auditable-floor rule, VERDICT r3 #2 / ADVICE r4)."""
    results, times = None, []
    for _ in range(passes):
        t0 = time.time()
        out = [solve_one(i) for i in range(n)]
        times.append(time.time() - t0)
        if results is None:
            results = out
    return results, min(times), [round(t, 4) for t in times]


# ---------------------------------------------------------------------------
# Pinned CPU floors (round-5 verdict item 1). The shared 1-vCPU host's floor
# drifts 2-2.5x between rounds; a multiplier computed against today's floor
# alone can "improve" from floor shrinkage with zero TPU progress. Every row
# therefore divides by max(floor_today, floor_pinned) where the pin is the
# strongest floor ever measured for that config (BASELINE.json "floors"),
# and main() ratchets the pin upward when today's measurement is stronger.
# ---------------------------------------------------------------------------

def _load_pinned_floors():
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")) as f:
            return json.load(f).get("floors", {})
    except (OSError, ValueError):
        return {}


PINNED_FLOORS = _load_pinned_floors()
_FLOOR_RATCHET: dict = {}


def floor_fields(metric, tpu_value, cpu_today, passes, n_cpu):
    """Audit + multiplier fields for a CPU-floored row: today's measured
    floor with its pass list, the pinned floor with provenance, and
    vs_baseline against the stronger of the two."""
    pin = PINNED_FLOORS.get(metric, {})
    pinned = float(pin.get("cpu_solves_per_sec") or 0.0)
    floor = max(cpu_today, pinned)
    if cpu_today > pinned:
        _FLOOR_RATCHET[metric] = {
            "cpu_solves_per_sec": round(cpu_today, 3),
            "source": "bench_all.py measurement (auto-ratchet)",
            "date": time.strftime("%Y-%m-%d"),
            "cpu_problems": n_cpu,
            "cpu_pass_times_s": passes,
            "note": "measured floor exceeded the previous pin",
        }
    return {
        "vs_baseline": round(tpu_value / floor, 2),
        "cpu_solves_per_sec": round(cpu_today, 3),
        "cpu_pass_times_s": passes,
        "cpu_problems": n_cpu,
        "cpu_floor_pinned": pinned,
        "cpu_floor_used": round(floor, 3),
        "cpu_floor_source": pin.get("source", "unpinned (this run's measurement)"),
    }


def rot_err_deg(a, b):
    r = np.asarray(a)[:3, :3] @ np.asarray(b)[:3, :3].T
    c = np.clip((np.trace(r) - 1) / 2, -1, 1)
    return float(np.degrees(np.arccos(c)))


# ---------------------------------------------------------------------------

def bench_homography():
    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.parallel import batched
    from calibration_tpu.ops import homography as H
    import jax.numpy as jnp

    # default from the measured curve (2026-08-21, cap4 + fused f32 seed):
    # B=4096 6550, B=8192 15393, B=16384 10649 solves/s — amortizes to 8192,
    # turns over at 16384 (phased-program temporaries pressure HBM)
    b = int(os.environ.get("BENCH_HOMOG_BATCH", "8192"))
    n_cpu = 32
    _log(f"[1 homography] batch={b}")
    hs, src, dst = pb.homography_problems(b)
    opts = OptimOptions(max_iterations=50, compute_covariance=False)

    # CPU floor FIRST on an idle host (bench.py methodology: measuring it
    # after the TPU section exposes it to compile-service aftershocks and
    # understates the floor ~2x — the r4 bench.py-vs-bench_all gap)
    h0 = np.asarray(H.estimate_homography_dlt(jnp.asarray(src[:n_cpu]), jnp.asarray(dst[:n_cpu])))
    cpu_res, cpu_dt, passes = timed_cpu(
        lambda i: cb.solve_homography_cpu(src[i], dst[i], h0[i])[1], n_cpu
    )

    fn = lambda s, d: batched.homography_batch(s, d, options=opts)
    (out, hm, _, _), dt = timed_batch(
        fn, (src, dst), lambda k: pb.homography_problems(b, seed=repeat_seed(11, k))[1:3]
    )
    hm = np.asarray(hm)
    parity = max(float(np.abs(hm[i] - cpu_res[i]).max()) for i in range(n_cpu))

    # same-minimum gate (config-2/3/5 pattern): both solvers' H evaluated by
    # ONE shared numpy transfer-cost evaluator. dH alone conflates "different
    # minimum" with "different stop-point in the same eps=1e-9 basin" — the
    # f32 seed changes the LM's path, so endpoints spread ~1e-7 in the flat
    # directions while the cost agrees to ~1e-12.
    def transfer_cost(h, s, d):
        ph = np.concatenate([s, np.ones((len(s), 1))], 1) @ h.T
        r = ph[:, :2] / ph[:, 2:] - d
        return float((r * r).sum())

    cost_rels = [
        abs(transfer_cost(hm[i], src[i], dst[i]) - transfer_cost(cpu_res[i], src[i], dst[i]))
        / max(transfer_cost(cpu_res[i], src[i], dst[i]), 1e-300)
        for i in range(n_cpu)
    ]
    cost_rel = float(max(cost_rels))
    return {
        "metric": "homography_dlt_lm_solves_per_sec",
        "value": round(b / dt, 1),
        "unit": "solves/sec",
        **floor_fields("homography_dlt_lm_solves_per_sec", b / dt, n_cpu / cpu_dt, passes, n_cpu),
        "parity_max_abs_dH": parity,
        "parity_final_cost_rel": cost_rel,
        "parity_cost_ok": bool(cost_rel <= 1e-7),
    }


def bench_intrinsics():
    import bench as headline

    b = int(os.environ.get("BENCH_BATCH", "256"))
    _log(f"[2 intrinsics] batch={b}")
    obj, uv, poses, intr_gt = headline.make_problems(b)

    # ONE shared floor recipe with bench.py (8 problems x 6 passes, CPU
    # first on an idle host) — resolves the r4 harness disagreement where
    # bench.py said 24.24/s and this file said 12.38/s for the same class
    cpu = headline.cpu_baseline_throughput(obj, uv, poses, intr_gt)
    cpu_tp = cpu["solves_per_sec"]

    throughput, rms, intr = headline.tpu_throughput(
        obj, uv, make=lambda k: headline.make_problems(b, seed=repeat_seed(7, k))[:2]
    )

    n_cpu = 4
    x0s = [
        cb.intrinsics_x0(
            intr_gt + np.array([8.0, -6.0, 4.0, -3.0, 0, 0, 0, 0, 0, 0]), poses[i]
        )
        for i in range(n_cpu)
    ]
    cpu_res, _, _ = timed_cpu(
        lambda i: cb.solve_intrinsics_cpu(obj[i], uv[i], x0s[i]), n_cpu, passes=1
    )
    # parity: TPU and CPU solve the same problems; both land in the same
    # least-squares minimum (fx is ambiguity-limited, so compare solutions
    # to each other, not to GT)
    deltas = [np.abs(intr[i, :4] - cpu_res[i].x[:4]).max() for i in range(n_cpu)]

    # --- same-minimum gate (VERDICT r2 #3): both sides solve the IDENTICAL
    # objective — plain least squares (huber off), skew frozen at zero — on
    # the same problems, and their final costs are evaluated by ONE shared
    # numpy evaluator. If the solvers truly share the minimum, the costs
    # must agree to ~1e-8 relative; full 10-param deltas are reported so the
    # fx ambiguity-valley claim stays inspectable (Ceres final_cost
    # semantics: ceresutils.h:40).
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.parallel import batched

    n_gate = 4
    opts_plain = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=80, huber_delta=0.0, compute_covariance=False)
    )
    _, gate_out = batched.intrinsics_batch(obj[:n_gate], uv[:n_gate], opts=opts_plain)
    _, intr_t, poses_t, _, _, _ = gate_out
    intr_t = np.asarray(intr_t)
    poses_t = np.asarray(poses_t)

    cost_rels, dparams = [], []
    for i in range(n_gate):
        r = cb.solve_intrinsics_cpu(obj[i], uv[i], x0s[i], fix_skew=True)
        x_t = cb.intrinsics_x0(intr_t[i], poses_t[i])
        c_t = cb.intrinsics_plain_cost(x_t, obj[i], uv[i])
        c_c = cb.intrinsics_plain_cost(r.x, obj[i], uv[i])
        cost_rels.append(abs(c_t - c_c) / max(c_t, c_c, 1e-300))
        dparams.append(float(np.abs(intr_t[i] - r.x[:10]).max()))
    cost_rel = float(max(cost_rels))
    return {
        "metric": "batched_planar_intrinsics_solves_per_sec",
        "value": round(throughput, 3),
        "unit": "solves/sec",
        **floor_fields(
            "batched_planar_intrinsics_solves_per_sec", throughput, cpu_tp,
            cpu["passes_sec"], cpu["problems"],
        ),
        "parity_max_abs_dK_px": float(max(deltas)),
        "parity_final_cost_rel": cost_rel,
        "parity_cost_ok": bool(cost_rel <= 1e-7),
        "parity_max_abs_dparam_full10": float(max(dparams)),
        "parity_note": (
            "cost_rel is the same-minimum criterion (shared numpy evaluator); "
            "dparam_full10 is dominated by k3 along the cost-flat fx/k3/depth "
            "ambiguity valley and is reported for inspectability, not gated"
        ),
        "mean_view_rms_px": rms,
    }


def bench_intrinsics_scheimpflug():
    """Config 2S: the flagship solve through the GENERIC camera-model path —
    Scheimpflug (12-param tilted-sensor wrapper) batched intrinsics, tilts
    seeded at zero. The reference instantiates optimize_intrinsics for
    ScheimpflugCamera (src/estimation/optim/intrinsics.cpp:122-132) at the
    same templated-code-path parity. vs_baseline here is RELATIVE throughput
    vs the same-batch pinhole solve (generic-model overhead, target ~1x),
    not a CPU multiple — the CPU stand-in has no Scheimpflug solver."""
    import jax.numpy as jnp

    import bench as headline
    from calibration_tpu.models import scheimpflug
    from calibration_tpu.ops import se3
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.parallel import batched

    b = int(os.environ.get("BENCH_SCHEIM_BATCH", os.environ.get("BENCH_BATCH", "256")))
    _log(f"[2S scheimpflug intrinsics] batch={b}")
    tilt = np.array([0.05, -0.04])

    def make(seed):
        obj, _, poses, intr10 = headline.make_problems(b, seed=seed)
        # the reference's own Scheimpflug configuration: radial-only base
        # distortion, no tangential coefficients (scheimpflug_test.cpp:17-18
        # builds the camera with a two-coefficient BrownConrady). Free
        # tangential + tilt is ill-posed (tau ~ p1/p2 to first order,
        # docs/SCHEIMPFLUG.md) — LM wanders the flat valley for 10-58
        # linearizations; the reference would suffer identically under
        # Ceres. Tilt recovery IS gated here since the problem is well-posed.
        intr10 = np.asarray(intr10).copy()
        intr10[8:10] = 0.0
        intr12 = np.concatenate([intr10, tilt])
        obj3 = jnp.concatenate(
            [jnp.asarray(obj), jnp.zeros(obj.shape[:-1] + (1,))], -1
        )
        pts_c = se3.se3_apply(jnp.asarray(poses)[:, :, None], obj3)
        uv = np.asarray(scheimpflug.project(jnp.asarray(intr12), pts_c))
        uv = uv + np.random.default_rng(seed + 1).normal(0, 0.2, uv.shape)
        return obj, uv, intr12

    obj, uv, intr12_gt = make(7)
    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=60, compute_covariance=True),
        fixed_distortion_indices=(2, 3),  # p1, p2 in [k1,k2,p1,p2] semantics
    )

    fn_s = lambda o, u: batched.intrinsics_batch(
        o, u, opts=opts, model_name="scheimpflug_pinhole_brown_conrady"
    )
    (_, out_s), dt_s = timed_batch(
        fn_s, (obj, uv), lambda k: make(repeat_seed(23, k))[:2]
    )
    _, intr, _, view_errors, _, _ = out_s
    intr = np.asarray(intr)
    rms = float(np.sqrt(np.mean(np.asarray(view_errors) ** 2)))

    obj_p, uv_p, _, _ = headline.make_problems(b, seed=7)
    opts_p = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=60, compute_covariance=True)
    )
    fn_p = lambda o, u: batched.intrinsics_batch(o, u, opts=opts_p)
    _, dt_p = timed_batch(
        fn_p, (obj_p, uv_p),
        lambda k: headline.make_problems(b, seed=repeat_seed(29, k))[:2],
    )
    tilt_dev = np.abs(intr[:, 10:] - tilt)
    # same order-statistics gate as config 2T: the max over 2B noisy draws
    # is gated looser than the median (see bench_scheimpflug_tilt)
    tilt_ok = bool(
        (np.median(tilt_dev) < 0.006)
        and (np.percentile(tilt_dev, 95) < 0.015)
        and (tilt_dev.max() < 0.03)
    )
    return {
        "metric": "scheimpflug_intrinsics_solves_per_sec",
        "value": round(b / dt_s, 2),
        "unit": "solves/sec",
        "vs_baseline": round(dt_p / dt_s, 3),
        "baseline_note": "relative to the same-batch pinhole solve (generic-model overhead)",
        "pinhole_solves_per_sec": round(b / dt_p, 2),
        "mean_view_rms_px": rms,
        "tilt_max_abs_dev_rad": float(tilt_dev.max()),
        "tilt_p95_abs_dev_rad": float(np.percentile(tilt_dev, 95)),
        "tilt_median_abs_dev_rad": float(np.median(tilt_dev)),
        "tilt_gate_ok": tilt_ok,
        "parity_note": (
            "reference Scheimpflug configuration (radial-only base "
            "distortion, p1=p2 fixed at 0 via fixed_distortion_indices — "
            "scheimpflug_test.cpp:17-18): tilt IS identifiable, so the "
            "tilt deviation is gated with the same order statistics as "
            "config 2T (median < 0.006, p95 < 0.015, max < 0.03 rad at "
            "0.2px noise); "
            "mean_view_rms_px ~ injected noise is the solution-quality "
            "gate. The free-tangential variant is ill-posed (tau ~ p1/p2 "
            "to first order, docs/SCHEIMPFLUG.md — LM wanders the flat "
            "valley for 10-58 linearizations vs 11-15 here) and makes no "
            "recovery claim; config 2T gates recovery at ~5 deg tilt"
        ),
    }


def bench_scheimpflug_tilt():
    """Config 2T: noisy TILT RECOVERY in the identifiable regime — large
    tilts (tau ~ 5 deg) on a zero-tangential camera with p1 = p2 pinned at 0
    via fixed_distortion_indices (reference semantics: the Scheimpflug test
    camera is two-coefficient radial, scheimpflug_test.cpp:17-18). Unlike
    2S (free tangential, where tau ~ p1/p2 to first order and the deviation
    is valley spread — docs/SCHEIMPFLUG.md section 2), here the tilt IS
    identifiable and tilt_max_abs_dev_rad is a GATED accuracy claim."""
    import jax.numpy as jnp

    import bench as headline
    from calibration_tpu.models import scheimpflug
    from calibration_tpu.ops import se3
    from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
    from calibration_tpu.parallel import batched

    b = int(os.environ.get("BENCH_SCHEIM_BATCH", os.environ.get("BENCH_BATCH", "256")))
    noise = 0.2
    _log(f"[2T scheimpflug tilt recovery] batch={b}")
    tilt = np.array([0.09, -0.07])  # ~5.2 / -4.0 deg

    def make(seed):
        obj, _, poses, intr10 = headline.make_problems(b, seed=seed)
        intr10 = np.asarray(intr10).copy()
        intr10[8:10] = 0.0  # zero-tangential GT camera
        intr12 = np.concatenate([intr10, tilt])
        obj3 = jnp.concatenate(
            [jnp.asarray(obj), jnp.zeros(obj.shape[:-1] + (1,))], -1
        )
        pts_c = se3.se3_apply(jnp.asarray(poses)[:, :, None], obj3)
        uv = np.asarray(scheimpflug.project(jnp.asarray(intr12), pts_c))
        uv = uv + np.random.default_rng(seed + 1).normal(0, noise, uv.shape)
        return obj, uv, intr12

    obj, uv, intr12_gt = make(7)
    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=60, compute_covariance=False),
        # pin p1, p2 at 0 ([k1..k_nr, p1, p2] indices, num_radial=2)
        fixed_distortion_indices=(2, 3),
        fixed_distortion_values=(0.0, 0.0),
    )

    fn = lambda o, u: batched.intrinsics_batch(
        o, u, opts=opts, model_name="scheimpflug_pinhole_brown_conrady"
    )
    (_, out), dt = timed_batch(fn, (obj, uv), lambda k: make(repeat_seed(31, k))[:2])
    lm_out, intr, _, view_errors, _, _ = out
    intr = np.asarray(intr)
    rms = float(np.sqrt(np.mean(np.asarray(view_errors) ** 2)))
    tilt_dev = np.abs(intr[:, 10:] - tilt)
    # identifiable-regime gate: tilts recovered well inside their magnitude
    # at 0.2 px noise — median is the accuracy claim, the max bound keeps
    # every lane sane (max is an order statistic over 2B draws, so it is
    # gated looser than the median)
    tilt_ok = bool(
        (np.median(tilt_dev) < 0.006)
        and (np.percentile(tilt_dev, 95) < 0.015)
        and (tilt_dev.max() < 0.03)
    )
    return {
        "metric": "scheimpflug_tilt_recovery_solves_per_sec",
        "value": round(b / dt, 2),
        "unit": "solves/sec",
        "vs_baseline": 1.0,
        "baseline_note": "accuracy gate row (tilt recovery), not a CPU multiple",
        "mean_view_rms_px": rms,
        "tilt_gt_rad": [float(t) for t in tilt],
        "tilt_max_abs_dev_rad": float(tilt_dev.max()),
        "tilt_p95_abs_dev_rad": float(np.percentile(tilt_dev, 95)),
        "tilt_median_abs_dev_rad": float(np.median(tilt_dev)),
        "tilt_recovery_ok": tilt_ok,
        "parity_note": (
            "p1=p2 pinned at 0 (fixed_distortion_indices) makes tau "
            "identifiable — gate: median dev < 0.006, p95 < 0.015, "
            "max < 0.03 rad at 0.2px noise (tilt magnitude 0.07-0.09); "
            "the free-tangential valley case is config 2S"
        ),
    }


def bench_extrinsics():
    from calibration_tpu.optim import ExtrinsicOptions, OptimOptions
    from calibration_tpu.parallel import batched

    # default batch from the measured throughput curve (stereo_sweep 2026-08-20:
    # B=64 142, B=128 171.6, B=256 142.9, B=512 53.1 rigs/s — HBM cliff past 256)
    b = int(os.environ.get("BENCH_STEREO_BATCH", "128"))
    n_cpu = 6
    _log(f"[3 stereo extrinsics] batch={b}")
    p = pb.stereo_problems(b)
    opts = ExtrinsicOptions(core=OptimOptions(max_iterations=50, compute_covariance=False))

    # CPU floor first (idle host — see bench_homography note)
    cpu_res, cpu_dt, passes = timed_cpu(
        lambda i: cb.solve_extrinsics_cpu(
            p["obj"][i], p["uv"][i], p["intr0"][i], p["c0"][i], p["r0"][i]
        ),
        n_cpu,
    )

    fn = lambda o, u, i0, c0, r0: batched.extrinsics_batch(o, u, i0, c0, r0, opts=opts)
    unpack = lambda q: (q["obj"], q["uv"], q["intr0"], q["c0"], q["r0"])
    (out, intr, c_se3_r, r_se3_t, _, _), dt = timed_batch(
        fn, unpack(p), lambda k: unpack(pb.stereo_problems(b, seed=repeat_seed(13, k)))
    )
    c_se3_r = np.asarray(c_se3_r)
    rots, tras = [], []
    for i in range(n_cpu):
        m = np.eye(4)
        m[:3, :3] = cb.so3_exp(cpu_res[i].x[:3])
        m[:3, 3] = cpu_res[i].x[3:6]
        rots.append(rot_err_deg(c_se3_r[i, 1], m))
        tras.append(float(np.abs(c_se3_r[i, 1, :3, 3] - m[:3, 3]).max()))

    # --- same-minimum gate (same pattern as config 2): plain least squares
    # (huber off) both sides, identical problems/seeds/gauge (cam0 + target0
    # constant, skew frozen at seed), final costs through ONE shared numpy
    # evaluator. Pins the rel-pose parity delta to the cost-flat planar
    # fx/depth valley rather than solver disagreement.
    n_gate = 2
    opts_plain = ExtrinsicOptions(
        core=OptimOptions(max_iterations=80, huber_delta=0.0, compute_covariance=False)
    )
    _, intr_g, c_g, r_g, _, _ = batched.extrinsics_batch(
        p["obj"][:n_gate], p["uv"][:n_gate], p["intr0"][:n_gate],
        p["c0"][:n_gate], p["r0"][:n_gate], opts=opts_plain,
    )
    intr_g, c_g, r_g = np.asarray(intr_g), np.asarray(c_g), np.asarray(r_g)
    cost_rels = []
    for i in range(n_gate):
        r = cb.solve_extrinsics_cpu(
            p["obj"][i], p["uv"][i], p["intr0"][i], p["c0"][i], p["r0"][i]
        )
        v, c = p["obj"][i].shape[0], p["obj"][i].shape[1]
        cams_c, views_c, intrs_c = cb.extrinsics_unpack_x(
            r.x, v, c, p["intr0"][i], p["r0"][i]
        )
        c_t = cb.extrinsics_plain_cost(c_g[i], r_g[i], intr_g[i], p["obj"][i], p["uv"][i])
        c_c = cb.extrinsics_plain_cost(cams_c, views_c, intrs_c, p["obj"][i], p["uv"][i])
        cost_rels.append(abs(c_t - c_c) / max(c_t, c_c, 1e-300))
    cost_rel = float(max(cost_rels))
    return {
        "metric": "stereo_extrinsics_solves_per_sec",
        "value": round(b / dt, 2),
        "unit": "rigs/sec",
        **floor_fields("stereo_extrinsics_solves_per_sec", b / dt, n_cpu / cpu_dt, passes, n_cpu),
        "parity_relpose_rot_deg": float(max(rots)),
        "parity_relpose_trans_m": float(max(tras)),
        "parity_final_cost_rel": cost_rel,
        "parity_cost_ok": bool(cost_rel <= 1e-7),
    }


def bench_handeye():
    from calibration_tpu.optim import OptimOptions
    from calibration_tpu.parallel import batched

    b = int(os.environ.get("BENCH_HANDEYE_BATCH", "256"))
    n_cpu = 16
    _log(f"[4 hand-eye] batch={b}")
    g_gt, bg, ct = pb.handeye_problems(b)
    opts = OptimOptions(max_iterations=50, compute_covariance=False)

    dp = pb.pose([0.01, -0.008, 0.012], [0.004, -0.003, 0.002])
    cpu_res, cpu_dt, passes = timed_cpu(
        lambda i: cb.solve_handeye_cpu(bg[i], ct[i], g_gt[i] @ dp)[1], n_cpu
    )

    fn = lambda a, c: batched.handeye_batch(a, c, options=opts)
    (out, pose, _, _), dt = timed_batch(
        fn, (bg, ct), lambda k: pb.handeye_problems(b, seed=repeat_seed(17, k))[1:3]
    )
    pose = np.asarray(pose)
    rots = [rot_err_deg(pose[i], cpu_res[i]) for i in range(n_cpu)]
    tras = [float(np.abs(pose[i, :3, 3] - cpu_res[i][:3, 3]).max()) for i in range(n_cpu)]
    return {
        "metric": "handeye_axxb_solves_per_sec",
        "value": round(b / dt, 1),
        "unit": "rigs/sec",
        **floor_fields("handeye_axxb_solves_per_sec", b / dt, n_cpu / cpu_dt, passes, n_cpu),
        "parity_rot_deg": float(max(rots)),
        "parity_trans_m": float(max(tras)),
    }


def bench_bundle():
    from calibration_tpu.optim import BundleOptions, OptimOptions
    from calibration_tpu.parallel import batched

    # default from the measured curve (exp_bundle_stage 2026-08-21: B=64
    # 176-183, B=128 236-242, B=256 241 rigs/s — saturates at 128; lin
    # distribution is uniformly 4 so schedules are moot)
    b = int(os.environ.get("BENCH_BUNDLE_BATCH", "128"))
    n_cpu = 4
    _log(f"[5 bundle] batch={b}")
    p = pb.bundle_problems(b)
    o = p["bg"].shape[1]
    opts = BundleOptions(core=OptimOptions(max_iterations=50, compute_covariance=False))
    cam_idx = np.zeros((b, o), int)

    cpu_res, cpu_dt, passes = timed_cpu(
        lambda i: cb.solve_bundle_cpu(
            p["obj"][i], p["uv"][i], p["bg"][i], p["intr"], p["g0"][i], p["b0"][i]
        ),
        n_cpu,
    )

    fn = lambda obj, uv, bg, intrs, g0, b0: batched.bundle_batch(
        obj, uv, bg, cam_idx, intrs, g0, b0, opts=opts
    )
    unpack = lambda q: (
        q["obj"], q["uv"], q["bg"],
        np.tile(q["intr"][None, None], (b, 1, 1)), q["g0"][:, None], q["b0"],
    )
    (out, intr, g_se3_c, b_se3_t, _, _), dt = timed_batch(
        fn, unpack(p), lambda k: unpack(pb.bundle_problems(b, seed=repeat_seed(19, k)))
    )
    g_se3_c = np.asarray(g_se3_c)
    rots, tras = [], []
    for i in range(n_cpu):
        m = np.eye(4)
        m[:3, :3] = cb.so3_exp(cpu_res[i].x[:3])
        m[:3, 3] = cpu_res[i].x[3:6]
        rots.append(rot_err_deg(g_se3_c[i, 0], m))
        tras.append(float(np.abs(g_se3_c[i, 0, :3, 3] - m[:3, 3]).max()))

    # --- same-minimum gate (config-2/3 pattern): plain least squares both
    # sides (huber off, fixed intrinsics, same seeds), final costs through
    # ONE shared numpy evaluator of the X^-1 g^-1 T reprojection chain.
    n_gate = 2
    opts_plain = BundleOptions(
        core=OptimOptions(max_iterations=80, huber_delta=0.0, compute_covariance=False)
    )
    intrs_b = np.tile(p["intr"][None, None], (n_gate, 1, 1))
    _, _, g_g, b_g, _, _ = batched.bundle_batch(
        p["obj"][:n_gate], p["uv"][:n_gate], p["bg"][:n_gate],
        cam_idx[:n_gate], intrs_b, p["g0"][:n_gate, None], p["b0"][:n_gate],
        opts=opts_plain,
    )
    g_g, b_g = np.asarray(g_g), np.asarray(b_g)
    cost_rels = []
    for i in range(n_gate):
        r = cb.solve_bundle_cpu(
            p["obj"][i], p["uv"][i], p["bg"][i], p["intr"], p["g0"][i], p["b0"][i]
        )
        xm, tm = np.eye(4), np.eye(4)
        xm[:3, :3] = cb.so3_exp(r.x[:3]); xm[:3, 3] = r.x[3:6]
        tm[:3, :3] = cb.so3_exp(r.x[6:9]); tm[:3, 3] = r.x[9:12]
        c_t = cb.bundle_plain_cost(
            g_g[i, 0], b_g[i], p["intr"], p["obj"][i], p["uv"][i], p["bg"][i]
        )
        c_c = cb.bundle_plain_cost(
            xm, tm, p["intr"], p["obj"][i], p["uv"][i], p["bg"][i]
        )
        cost_rels.append(abs(c_t - c_c) / max(c_t, c_c, 1e-300))
    cost_rel = float(max(cost_rels))
    return {
        "metric": "bundle_handeye_target_solves_per_sec",
        "value": round(b / dt, 2),
        "unit": "rigs/sec",
        **floor_fields("bundle_handeye_target_solves_per_sec", b / dt, n_cpu / cpu_dt, passes, n_cpu),
        "parity_handeye_rot_deg": float(max(rots)),
        "parity_handeye_trans_m": float(max(tras)),
        "parity_final_cost_rel": cost_rel,
        "parity_cost_ok": bool(cost_rel <= 1e-7),
    }


def bench_linescan():
    from calibration_tpu.parallel import batched

    b = int(os.environ.get("BENCH_LINESCAN_BATCH", "1024"))
    n_cpu = 32
    _log(f"[5L line-scan] batch={b}")
    camera, obj, tgt_uv, laser_uv, plane_gt = pb.linescan_problems(b)

    cpu_res, cpu_dt, passes = timed_cpu(
        lambda i: cb.solve_linescan_cpu(camera[i], obj[i], tgt_uv[i], laser_uv[i])[0],
        n_cpu,
    )

    fn = lambda c, o, tu, lu: batched.linescan_batch(c, o, tu, lu)
    res, dt = timed_batch(
        fn, (camera, obj, tgt_uv, laser_uv),
        lambda k: pb.linescan_problems(b, seed=repeat_seed(23, k))[:4],
    )
    plane = np.asarray(res.plane)
    # parity: TPU and CPU run the same closed-form pipeline on the same rigs
    # (plane sign is canonicalized d >= 0; the SVD null vector's sign is
    # arbitrary)
    canon = lambda p: p if p[3] >= 0 else -p
    parity = max(
        float(np.abs(canon(plane[i]) - canon(cpu_res[i])).max()) for i in range(n_cpu)
    )
    ang_err = np.degrees(
        np.arccos(np.clip(np.abs(np.sum(plane[:, :3] * plane_gt[:, :3], -1)), 0, 1))
    )
    return {
        "metric": "linescan_laser_plane_solves_per_sec",
        "value": round(b / dt, 1),
        "unit": "rigs/sec",
        **floor_fields("linescan_laser_plane_solves_per_sec", b / dt, n_cpu / cpu_dt, passes, n_cpu),
        "parity_max_abs_dplane": parity,
        "gt_plane_angle_err_deg_max": float(ang_err.max()),
    }


def bench_pipeline():
    """BASELINE config 5 *as specified*: the full JSON pipeline — dataset
    files on disk -> loader -> IntrinsicStage (fleet dispatch over R
    sensors) -> HandEyeCalibrationStage -> BundleAdjustmentStage ->
    artifacts JSON written out. Wall time includes JSON parse, orchestration
    and artifact serialization (reference: bundle_pipeline.cpp:39-139 run
    once per robot cell). CPU floor = the same numeric core per rig
    (scipy analytic-Jacobian intrinsics + torch/scipy hand-eye + bundle,
    sequential) WITHOUT any orchestration cost — a stand-in that favors the
    CPU side."""
    rigs = int(os.environ.get("BENCH_PIPE_RIGS", "16"))
    return _bench_pipeline_impl(rigs, "full_json_pipeline_rigs_per_sec")


def bench_pipeline_fleet():
    """Config 5F: the same end-to-end JSON pipeline at fleet scale (64
    rigs in one process) — the deployment shape the batched stages are
    built for. Host costs (JSON parse/serialize, report assembly) scale
    linearly with rigs while the three device fleet dispatches are
    sublinear, so this is the honest upper line of the same pipeline;
    config 5P (16 rigs) stays the reference-shaped robot-cell number."""
    rigs = int(os.environ.get("BENCH_PIPE_FLEET_RIGS", "64"))
    return _bench_pipeline_impl(rigs, "full_json_pipeline_fleet_rigs_per_sec")


def _bench_pipeline_impl(rigs, metric):
    import tempfile

    from benchmarks import pipeline_fleet as pf

    _log(f"[{metric}] rigs={rigs}")

    def build(seed):
        d = tempfile.mkdtemp(prefix=f"bench_pipe_{seed}_")
        return pf.make_fleet(d, rigs=rigs, seed=seed)

    base = build(29)

    # CPU floor first (idle host)
    n_cpu = 4
    x0_he = [base["g_gt"][i] @ pb.pose([0.01, -0.008, 0.012], [0.004, -0.003, 0.002]) for i in range(n_cpu)]

    def cpu_rig(i):
        x0 = cb.intrinsics_x0(
            base["intr"] + np.array([8.0, -6.0, 4.0, -3.0, 0, 0, 0, 0, 0, 0]),
            base["ct_gt"][i],
        )
        cb.solve_intrinsics_cpu(base["obj"][i], base["uv"][i], x0)
        _, he = cb.solve_handeye_cpu(base["bg"][i], base["ct_gt"][i], x0_he[i])
        cb.solve_bundle_cpu(
            base["obj"][i], base["uv"][i], base["bg"][i], base["intr"],
            he, base["bt_gt"][i],
        )
        return he

    _, cpu_dt, passes = timed_cpu(cpu_rig, n_cpu)

    t0 = time.time()
    rc, art_path = pf.run_pipeline(base["input_path"])
    _log(f"  compile+first: {time.time() - t0:.1f}s (rc={rc})")
    assert rc == 0, f"pipeline failed rc={rc}"

    times = []
    for k in range(1, 3):
        fleet = build(repeat_seed(29, k))
        t0 = time.time()
        rck, _ = pf.run_pipeline(fleet["input_path"])
        times.append(time.time() - t0)
        assert rck == 0
    dt = min(times)

    # accuracy from the base run's artifacts
    with open(art_path) as f:
        art = json.load(f)
    g_err_rot, g_err_tra = [], []
    for r in range(rigs):
        g = np.array(art["bundle"][f"rig{r}"]["result"]["g_se3_c"][0])
        g_err_rot.append(rot_err_deg(g, base["g_gt"][r]))
        g_err_tra.append(float(np.abs(g[:3, 3] - base["g_gt"][r][:3, 3]).max()))

    return {
        "metric": metric,
        "value": round(rigs / dt, 2),
        "unit": "rigs/sec",
        **floor_fields(metric, rigs / dt, n_cpu / cpu_dt, passes, n_cpu),
        "handeye_rot_err_deg_max": float(max(g_err_rot)),
        "handeye_trans_err_m_max": float(max(g_err_tra)),
    }


def bench_linescan_ransac():
    """BASELINE config 5's RANSAC plane-fit variant under load: 20% of each
    rig's laser pixels replaced by gross outliers; every rig scores 256
    3-point hypotheses + SVD inlier refit in one batched program
    (reference: fit_plane_ransac, planefit.cpp:9-62, run serially per rig)."""
    from calibration_tpu.ops.ransac import RansacOptions
    from calibration_tpu.parallel import batched

    b = int(os.environ.get("BENCH_LINESCAN_RANSAC_BATCH", "256"))
    n_cpu = 8
    _log(f"[5R line-scan RANSAC] batch={b}")

    def problems(seed):
        camera, obj, tgt_uv, laser_uv, plane_gt = pb.linescan_problems(b, seed=seed)
        rng = np.random.default_rng(seed + 1)
        # gross outliers: random image positions on 20% of laser pixels
        out_mask = rng.random(laser_uv.shape[:-1]) < 0.2
        junk = rng.uniform(0, 640, laser_uv.shape)
        laser_uv = np.where(out_mask[..., None], junk, laser_uv)
        return camera, obj, tgt_uv, laser_uv, plane_gt

    camera, obj, tgt_uv, laser_uv, plane_gt = problems(31)
    opts = RansacOptions(max_iters=256, thresh=0.004, min_inliers=20)

    cpu_res, cpu_dt, passes = timed_cpu(
        lambda i: cb.solve_linescan_ransac_cpu(
            camera[i], obj[i], tgt_uv[i], laser_uv[i],
            thresh=0.004, max_iters=256, seed=1234567,
        )[0],
        n_cpu,
    )

    fn = lambda c, o, tu, lu: batched.linescan_ransac_batch(c, o, tu, lu, options=opts)
    res, dt = timed_batch(
        fn, (camera, obj, tgt_uv, laser_uv),
        lambda k: problems(repeat_seed(31, k))[:4],
    )
    plane = np.asarray(res.plane)
    ok = np.asarray(res.ok)
    canon = lambda p: p if p[3] >= 0 else -p
    parity = max(
        float(np.abs(canon(plane[i]) - canon(cpu_res[i])).max()) for i in range(n_cpu)
    )
    ang_err = np.degrees(
        np.arccos(np.clip(np.abs(np.sum(plane[:, :3] * plane_gt[:, :3], -1)), 0, 1))
    )
    return {
        "metric": "linescan_ransac_plane_solves_per_sec",
        "value": round(b / dt, 1),
        "unit": "rigs/sec",
        **floor_fields("linescan_ransac_plane_solves_per_sec", b / dt, n_cpu / cpu_dt, passes, n_cpu),
        "all_ok": bool(ok.all()),
        "parity_max_abs_dplane": parity,
        "gt_plane_angle_err_deg_max": float(ang_err.max()),
    }


def bench_linescan_scheimpflug():
    """Config 5S: BASELINE config 5's literal line-scan shape — a
    SCHEIMPFLUG camera (12-param tilted sensor) with the RANSAC plane fit
    under 20% outlier load. The reference's calibrate_laser_plane is
    templated over camera_model (linescan.h:63-91); here the same batched
    program runs with model_name="scheimpflug..." (generic unprojection via
    models/registry). vs_baseline is RELATIVE throughput vs the same-batch
    pinhole RANSAC run (generic-model overhead) — the numpy CPU line-scan
    baseline is pinhole-only. Accuracy gate: plane-normal angle vs GT at
    the noise level."""
    from calibration_tpu.ops.ransac import RansacOptions
    from calibration_tpu.parallel import batched

    b = int(os.environ.get("BENCH_LINESCAN_SCHEIM_BATCH", "256"))
    _log(f"[5S line-scan scheimpflug RANSAC] batch={b}")
    tau = (0.06, -0.04)

    def problems(seed, tilt):
        camera, obj, tgt_uv, laser_uv, plane_gt = pb.linescan_problems(
            b, seed=seed, tilt_tau=tilt
        )
        rng = np.random.default_rng(seed + 1)
        out_mask = rng.random(laser_uv.shape[:-1]) < 0.2
        junk = rng.uniform(0, 640, laser_uv.shape)
        laser_uv = np.where(out_mask[..., None], junk, laser_uv)
        return camera, obj, tgt_uv, laser_uv, plane_gt

    opts = RansacOptions(max_iters=256, thresh=0.004, min_inliers=20)
    model = "scheimpflug_pinhole_brown_conrady"

    camera, obj, tgt_uv, laser_uv, plane_gt = problems(37, tau)
    fn_s = lambda c, o, tu, lu: batched.linescan_ransac_batch(
        c, o, tu, lu, options=opts, model_name=model
    )
    res, dt_s = timed_batch(
        fn_s, (camera, obj, tgt_uv, laser_uv),
        lambda k: problems(repeat_seed(37, k), tau)[:4],
    )
    plane = np.asarray(res.plane)
    ok = np.asarray(res.ok)
    ang_err = np.degrees(
        np.arccos(np.clip(np.abs(np.sum(plane[:, :3] * plane_gt[:, :3], -1)), 0, 1))
    )

    cam_p, obj_p, tuv_p, luv_p, _ = problems(37, None)
    fn_p = lambda c, o, tu, lu: batched.linescan_ransac_batch(c, o, tu, lu, options=opts)
    _, dt_p = timed_batch(
        fn_p, (cam_p, obj_p, tuv_p, luv_p),
        lambda k: problems(repeat_seed(41, k), None)[:4],
    )
    return {
        "metric": "linescan_scheimpflug_ransac_solves_per_sec",
        "value": round(b / dt_s, 1),
        "unit": "rigs/sec",
        "vs_baseline": round(dt_p / dt_s, 3),
        "baseline_note": "relative to the same-batch pinhole RANSAC run (generic-model overhead)",
        "pinhole_solves_per_sec": round(b / dt_p, 1),
        "all_ok": bool(ok.all()),
        "gt_plane_angle_err_deg_max": float(ang_err.max()),
    }


CONFIGS = {
    "1": bench_homography,
    "2": bench_intrinsics,
    "2S": bench_intrinsics_scheimpflug,
    "2T": bench_scheimpflug_tilt,
    "3": bench_extrinsics,
    "4": bench_handeye,
    "5": bench_bundle,
    "5L": bench_linescan,
    "5P": bench_pipeline,
    "5F": bench_pipeline_fleet,
    "5R": bench_linescan_ransac,
    "5S": bench_linescan_scheimpflug,
}


def main():
    import jax

    which = os.environ.get("BENCH_CONFIGS", "1,2,2S,2T,3,4,5,5L,5P,5F,5R,5S").split(",")
    _log(f"[bench_all] backend: {jax.default_backend()}, devices: {jax.devices()}")
    results = []
    for key in which:
        key = key.strip()
        res = CONFIGS[key]()
        results.append(res)
        print(json.dumps(res), flush=True)
    if os.environ.get("BENCH_NO_WRITE"):
        return  # experimental sweep: print rows, leave BENCH_ALL.json alone
    # merge by metric so subset runs (BENCH_CONFIGS=...) update in place
    # instead of clobbering the full table
    merged = {}
    try:
        with open("BENCH_ALL.json") as f:
            for entry in json.load(f):
                merged[entry["metric"]] = entry
    except (OSError, ValueError, TypeError, KeyError):
        pass
    for res in results:
        merged[res["metric"]] = res
    with open("BENCH_ALL.json", "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    # ratchet pinned floors upward when today's measurement was stronger —
    # the pin is "the strongest floor ever measured", so it only ever rises
    if _FLOOR_RATCHET:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
        with open(path) as f:
            baseline = json.load(f)
        floors = baseline.setdefault("floors", {})
        for metric, entry in _FLOOR_RATCHET.items():
            _log(f"[floors] ratchet {metric}: "
                 f"{floors.get(metric, {}).get('cpu_solves_per_sec')} -> "
                 f"{entry['cpu_solves_per_sec']}")
            floors[metric] = entry
        with open(path, "w") as f:
            json.dump(baseline, f, indent=2)


if __name__ == "__main__":
    main()
