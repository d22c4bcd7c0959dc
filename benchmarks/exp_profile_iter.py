"""Decompose the per-iteration cost of the flagship batched intrinsics LM
solve (VERDICT round-3 item 2b: profile one B=256 solve and name the top
ops). Times each stage of one LM iteration as its OWN jitted program on the
bench shapes, with distinct inputs per timed repeat (execution-layer memo).

Stages: residual eval | per-view jacfwd (f64) | per-view jacfwd (f32) |
gram-matrix assembly | damped Schur solve | one full fused iteration.

Usage: python benchmarks/exp_profile_iter.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/calibration_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp

    from bench import make_problems
    from calibration_tpu.ops import se3, linalg
    from calibration_tpu.optim import intrinsics as oi
    from calibration_tpu.optim.blocks import poses_to_quat_tran

    print(f"backend={jax.default_backend()} batch={batch}", file=sys.stderr)

    def data(seed):
        obj, uv, poses, intr_gt = make_problems(batch, seed=seed)
        quats, trans = poses_to_quat_tran(jnp.asarray(poses).reshape(-1, 4, 4))
        v = obj.shape[1]
        quats = np.asarray(quats).reshape(batch, v, 4)
        trans = np.asarray(trans).reshape(batch, v, 3)
        intr = np.tile(np.asarray(intr_gt)[None], (batch, 1))
        intr[:, 0] += np.linspace(0, 3, batch)  # off-minimum so nothing is degenerate
        return (jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(intr),
                jnp.asarray(quats), jnp.asarray(trans))

    res_view = lambda intr, q, t, o, u, m: oi._view_residual(oi.PINHOLE, intr, q, t, o, u, m)

    def per_view_jac(intr, quats, trans, obj, uv, mask, dtype):
        pg = 10

        def res_local(delta, quat, tran, o, u, m):
            xg = intr.astype(dtype) + delta[:pg]
            dq = se3.exp_quat(delta[pg:pg + 3])
            qn = se3.quat_mul(quat, dq)
            qn = qn / jnp.linalg.norm(qn)
            return res_view(xg, qn, tran + delta[pg + 3:], o, u, m)

        zero = jnp.zeros((16,), dtype)
        return jax.vmap(
            lambda q, t, o, u, m: jax.jacfwd(res_local)(
                zero, q.astype(dtype), t.astype(dtype), o.astype(dtype),
                u.astype(dtype), m.astype(dtype))
        )(quats, trans, obj, uv, mask)

    @jax.jit
    def f_residual(obj, uv, intr, quats, trans):
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        f = lambda i, qs, ts, o, u, m: jax.vmap(res_view, in_axes=(None, 0, 0, 0, 0, 0))(i, qs, ts, o, u, m)
        return jax.vmap(f)(intr, quats, trans, obj, uv, mask)

    @jax.jit
    def f_jac64(obj, uv, intr, quats, trans):
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        return jax.vmap(lambda i, qs, ts, o, u, m: per_view_jac(i, qs, ts, o, u, m, jnp.float64))(
            intr, quats, trans, obj, uv, mask)

    @jax.jit
    def f_jac32(obj, uv, intr, quats, trans):
        mask = jnp.ones(obj.shape[:-1], obj.dtype)
        return jax.vmap(lambda i, qs, ts, o, u, m: per_view_jac(i, qs, ts, o, u, m, jnp.float32))(
            intr, quats, trans, obj, uv, mask)

    @jax.jit
    def f_gram(jac, r):
        a_blk = jac[..., :10]
        b_blk = jac[..., 10:]
        u = jnp.einsum("bvmi,bvmj->bij", a_blk, a_blk)
        wm = jnp.einsum("bvmi,bvmj->bvij", a_blk, b_blk)
        vb = jnp.einsum("bvmi,bvmj->bvij", b_blk, b_blk)
        gu = jnp.einsum("bvmi,bvm->bi", a_blk, r)
        gv = jnp.einsum("bvmi,bvm->bvi", b_blk, r)
        return u, wm, vb, gu, gv

    @jax.jit
    def f_solve(u, wm, vb, gu, gv):
        mu = 1e-4
        v_mu = vb + mu * jnp.eye(6)
        v_inv = jax.vmap(jax.vmap(linalg.spd_inverse))(v_mu)
        wvinv = jnp.einsum("bvij,bvjk->bvik", wm, v_inv)
        s_mat = u + mu * jnp.eye(10) - jnp.einsum("bvik,bvjk->bij", wvinv, wm)
        rhs = -(gu - jnp.einsum("bvik,bvk->bi", wvinv, gv))
        dg = jax.vmap(linalg.spd_solve)(s_mat, rhs)
        dv = -jnp.einsum("bvij,bvj->bvi", v_inv,
                         gv + jnp.einsum("bvji,bj->bvi", wm, dg))
        return dg, dv

    def timeit(name, fn, args_fn, repeats=3):
        out = fn(*args_fn(0))
        jax.block_until_ready(out)
        times = []
        for k in range(1, repeats + 1):
            a = args_fn(k)
            t0 = time.time()
            jax.block_until_ready(fn(*a))
            times.append(time.time() - t0)
        print(f"{name}: {min(times)*1000:.1f} ms")
        return min(times), out

    datasets = {k: data(700 + k) for k in range(4)}
    dget = lambda k: datasets[k]

    t_res, r0 = timeit("residual eval (B,V,m)", f_residual, dget)
    t_j64, jac0 = timeit("jacfwd f64 (B,V,m,16)", f_jac64, dget)
    t_j32, _ = timeit("jacfwd f32", f_jac32, dget)

    jacs = {k: f_jac64(*dget(k)) for k in range(4)}
    rs = {k: f_residual(*dget(k)) for k in range(4)}
    for k in range(4):
        jax.block_until_ready(jacs[k]); jax.block_until_ready(rs[k])
    t_gram, g0 = timeit("gram assembly", f_gram, lambda k: (jacs[k], rs[k]))
    grams = {k: f_gram(jacs[k], rs[k]) for k in range(4)}
    t_solve, _ = timeit("damped schur solve", f_solve, lambda k: grams[k])

    total = t_res + t_j64 + t_gram + t_solve
    print(f"\none-iteration stage sum: {total*1000:.1f} ms "
          f"(residual {100*t_res/total:.0f}% | jacfwd {100*t_j64/total:.0f}% | "
          f"gram {100*t_gram/total:.0f}% | solve {100*t_solve/total:.0f}%)")
    print(f"jacfwd f32 is {t_j64/t_j32:.2f}x faster than f64")


if __name__ == "__main__":
    main()
