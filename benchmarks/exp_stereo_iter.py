"""Config-3 per-iteration decomposition: where does one stereo LM
linearization's time go at batch width B?

exp_stereo_stage showed the linearization distribution is TIGHT (5/5/6/6
at B=128), so phased compaction cannot help config 3 — the whole lever is
per-linearization cost. This times the pieces of one linearization as
separate jits on the bench shapes (V=8, C=2, N=35), each on distinct
inputs per repeat (execution-layer memo rule):

  residual   one masked residual evaluation, all views/cams
  jac64      per-camera-grouped jacfwd (the default path), f64
  jac32      same Jacobian with f32 inputs (isolated MXU-native speed)
  dispatch   a trivial elementwise program on the same input tree —
             the remote-execution dispatch+transfer floor any program pays

Full-solve wall/linearization (exp_stereo_stage: ~0.65s / 5.5 lin at
B=128) minus (residual-evals + jac64) bounds the gram+Schur+while_loop
share. If jac64 is a small slice, a mixed-precision Jacobian phase cannot
win (the intrinsics mixed_jac no-win, docs/STATUS.md round 4, predicted
the same).

CAVEAT (measured 2026-08-21): on this attachment the execution layer
replays CHEAP same-shape programs even for genuinely different inputs —
every repeat of the residual-only arm fingerprinted bit-identical to the
warmup and timed_batch correctly aborted ("no honest timing"). The
full-solve numbers in exp_stereo_stage survive the guard (LM outputs
differ); the per-piece decomposition needs an attachment whose executor
does not memoize, or inputs routed through a side effect the memo cannot
see. Kept for such days.

Usage: python benchmarks/exp_stereo_iter.py [batch] [repeats]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp

    from bench_all import repeat_seed, timed_batch
    from benchmarks import problems as pb
    from calibration_tpu.models.registry import PINHOLE
    from calibration_tpu.optim import blocks, extrinsics as ex

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)
    pc, model = PINHOLE.param_count, PINHOLE

    def pack(q):
        """(obj, uv, mask, xg, vq, vt) batches from a stereo_problems dict."""
        obj, uv = jnp.asarray(q["obj"]), jnp.asarray(q["uv"])
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        cq, ct = blocks.poses_to_quat_tran(jnp.asarray(q["c0"]))
        vq, vt = blocks.poses_to_quat_tran(jnp.asarray(q["r0"]))
        b = obj.shape[0]
        xg = jnp.concatenate(
            [jnp.asarray(q["intr0"]).reshape(b, -1), cq.reshape(b, -1),
             ct.reshape(b, -1)], axis=-1,
        )
        return obj, uv, mask, xg, vq, vt

    base = pack(pb.stereo_problems(batch))
    make = lambda k: pack(pb.stereo_problems(batch, seed=repeat_seed(13, k)))
    c = base[0].shape[2]  # (B, V, C, N, 2) -> C

    res_1view = lambda xg, q, t, o, u, m: ex._view_residual(
        model, xg, q, t, o, u, m, pc, c
    )
    jac_1view = lambda xg, q, t, o, u, m: ex._view_residual_jac_grouped(
        model, xg, q, t, o, u, m, pc, c
    )

    def over_views(fn):
        per_rig = lambda xg, vq, vt, o, u, m: jax.vmap(
            lambda q, t, ov, uv_, mv: fn(xg, q, t, ov, uv_, mv)
        )(vq, vt, o, u, m)
        return jax.jit(
            lambda o, u, m, xg, vq, vt: jax.vmap(per_rig)(xg, vq, vt, o, u, m)
        )

    arms = {
        "residual": over_views(res_1view),
        "jac64": over_views(jac_1view),
        "jac32": over_views(
            lambda xg, q, t, o, u, m: jac_1view(
                xg.astype(jnp.float32), q.astype(jnp.float32),
                t.astype(jnp.float32), o.astype(jnp.float32),
                u.astype(jnp.float32), m.astype(jnp.float32),
            )
        ),
        "dispatch": jax.jit(
            lambda o, u, m, xg, vq, vt: (o.sum(-1) + 1.0, xg * 2.0)
        ),
    }
    rows = {}
    for name, fn in arms.items():
        _, dt = timed_batch(fn, base, make, repeats=repeats)
        rows[name] = dt
        print(f"{name:>9}: {dt * 1e3:8.2f} ms  ({dt * 1e6 / batch:7.1f} us/rig)")

    # shares assuming ~5.5 linearizations and ~2 extra residual evals per
    # accepted step (trial loop), from the exp_stereo_stage distribution
    lin = 5.5
    full_per_lin = None
    if len(sys.argv) > 3:
        full_per_lin = float(sys.argv[3]) / lin
    print(
        f"implied per-solve: jac64 x{lin:.1f} = {rows['jac64'] * lin * 1e3:.1f} ms, "
        f"residual x{lin * 3:.1f} = {rows['residual'] * lin * 3 * 1e3:.1f} ms, "
        f"dispatch floor = {rows['dispatch'] * 1e3:.1f} ms"
        + (f", full/lin = {full_per_lin * 1e3:.1f} ms" if full_per_lin else "")
    )


if __name__ == "__main__":
    main()
