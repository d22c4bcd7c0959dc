"""Linearization-count sweep for the config-2S Scheimpflug intrinsics solve
(reference configuration: radial-only base distortion, p1/p2 fixed — the
well-posed tilt problem, scheimpflug_test.cpp:17-18).

Arms: LM initial damping (CALIB_LM_MU_INIT) x tilt seed (zero vs a small
symmetric probe pair; the production seed is zero-tilt). Counts are
backend-independent, so the sweep runs meaningfully on local CPU while
wall-clock confirmation needs the chip. Each arm reports the linearization
distribution (the vmapped while_loop pays batch-MAX at full width; the
phased path pays phase-1 cap + continuation max) and final-cost parity vs
the mu=1e-6 zero-seed baseline so a faster arm is only adopted at the same
minimum.

Usage: python benchmarks/exp_scheim_mu.py [batch] [mu ...]
  (spawns one subprocess per mu — _MU_INIT is read at import time)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_MUS = ["1e-4", "1e-6", "1e-8"]

_CHILD = """
import json, sys
import numpy as np
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
from bench import make_problems
from calibration_tpu.models import scheimpflug
from calibration_tpu.ops import se3, intrinsics_linear
from calibration_tpu.optim import IntrinsicsOptimOptions, OptimOptions
from calibration_tpu.optim.intrinsics import optimize_intrinsics_device
from calibration_tpu.models.registry import get_model

batch = %(batch)d
tilt = np.array([0.05, -0.04])
obj, _, poses_gt, intr10 = make_problems(batch, seed=7)
intr10 = np.asarray(intr10).copy()
intr10[8:10] = 0.0  # radial-only base distortion (reference 2S config)
intr12_gt = np.concatenate([intr10, tilt])
obj3 = jnp.concatenate([jnp.asarray(obj), jnp.zeros(obj.shape[:-1] + (1,))], -1)
pts_c = se3.se3_apply(jnp.asarray(poses_gt)[:, :, None], obj3)
uv = np.asarray(scheimpflug.project(jnp.asarray(intr12_gt), pts_c))
uv = uv + np.random.default_rng(8).normal(0, 0.2, uv.shape)

opts = IntrinsicsOptimOptions(
    core=OptimOptions(max_iterations=60, compute_covariance=False),
    fixed_distortion_indices=(2, 3),
)
model = get_model("scheimpflug_pinhole_brown_conrady")
tau_seed = %(tau_seed)r

@jax.jit
def solve(obj, uv):
    mask = jnp.ones(obj.shape[:-1], obj.dtype)
    seed = jax.vmap(intrinsics_linear.estimate_intrinsics)(obj, uv, mask > 0)
    seed_kmtx = seed.kmtx.at[..., 4].set(0.0)
    tail = jnp.zeros(seed_kmtx.shape[:-1] + (7,), obj.dtype)
    if tau_seed:
        tail = tail.at[..., 5].set(tau_seed[0]).at[..., 6].set(tau_seed[1])
    intr0 = jnp.concatenate([seed_kmtx, tail], axis=-1)
    fn = lambda o, u, m, i0, p0: optimize_intrinsics_device(
        o, u, i0, p0, mask=m, model=model, opts=opts
    )
    out, intr, poses, view_errors, cov, cov_ok = jax.vmap(fn)(
        obj, uv, mask, intr0, seed.c_se3_t
    )
    return intr, out.cost, out.iterations, out.linearizations, view_errors

intr, cost, iters, lins, ve = (
    np.asarray(a) for a in solve(jnp.asarray(obj), jnp.asarray(uv))
)
tau_dev = np.abs(intr[:, 10:12] - tilt[None]).max(axis=1)
print(json.dumps({
    "lin_min": int(lins.min()), "lin_med": float(np.median(lins)),
    "lin_p90": float(np.percentile(lins, 90)), "lin_max": int(lins.max()),
    "trials_max": int(iters.max()),
    "cost_med": float(np.median(cost)),
    "rms": float(np.sqrt(np.mean(ve ** 2))),
    "tau_dev_med": float(np.median(tau_dev)),
    "tau_dev_max": float(tau_dev.max()),
}))
"""


def run(mu, batch, root, tau_seed):
    env = dict(os.environ, CALIB_LM_MU_INIT=mu)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"root": root, "batch": batch,
                                          "tau_seed": tau_seed}],
        env=env, capture_output=True, text=True, check=False,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        print(out.stdout, out.stderr, file=sys.stderr)
        raise


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mus = sys.argv[2:] or DEFAULT_MUS
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # cost-parity anchor: the mu=1e-6 zero-seed arm (the docstring's
    # baseline), run first explicitly — with DEFAULT_MUS the first sweep arm
    # would otherwise be mu=1e-4 and every dcost_med_rel would anchor wrong
    base = run("1e-6", batch, root, None)
    for tau_seed in (None, (0.02, -0.02)):
        for mu in mus:
            r = run(mu, batch, root, tau_seed)
            rel = abs(r["cost_med"] - base["cost_med"]) / max(base["cost_med"], 1e-300)
            print(
                f"mu={mu:>6} tau_seed={tau_seed} lin med/p90/max = "
                f"{r['lin_med']:.0f}/{r['lin_p90']:.0f}/{r['lin_max']}"
                f"  trials_max {r['trials_max']}  rms {r['rms']:.4f}"
                f"  tau_dev med/max {r['tau_dev_med']:.4f}/{r['tau_dev_max']:.4f}"
                f"  dcost_med_rel {rel:.2e}"
            )


if __name__ == "__main__":
    main()
