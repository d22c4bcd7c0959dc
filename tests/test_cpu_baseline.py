"""Correctness of the Ceres-class CPU baselines (benchmarks/cpu_baseline.py):
the analytic Jacobians must match finite differences, and every solver must
recover ground truth on noiseless synthetic problems — otherwise the
vs_baseline multiplier in bench.py is against a broken stand-in."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import synth
from benchmarks import cpu_baseline as cb


def _finite_diff(fun, x0, eps=1e-7):
    r0 = fun(x0)
    J = np.zeros((r0.size, x0.size))
    for i in range(x0.size):
        xp = x0.copy()
        xp[i] += eps
        xm = x0.copy()
        xm[i] -= eps
        J[:, i] = (fun(xp) - fun(xm)) / (2 * eps)
    return J


def _intrinsics_problem(noise=0.0, v=5):
    rng = np.random.default_rng(5)
    intr = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.04)
    poses = synth.circle_views(v)
    uv = synth.render_pixels(intr, poses, obj, noise=noise, rng=rng if noise else None)
    obj_b = np.tile(obj[None], (v, 1, 1))
    return intr, obj_b, uv, poses


def test_intrinsics_analytic_jacobian_matches_fd():
    intr, obj, uv, poses = _intrinsics_problem()
    x0 = cb.intrinsics_x0(intr * (1 + 0.01), poses)
    x0[10:] += 0.003  # off the solution so the Jacobian is generic

    fun = lambda x: cb.intrinsics_residual_jac(x, obj, uv, with_jac=False)[0]
    _, J = cb.intrinsics_residual_jac(x0, obj, uv)
    J_fd = _finite_diff(fun, x0)
    scale = np.maximum(1.0, np.abs(J_fd))
    np.testing.assert_allclose(J / scale, J_fd / scale, atol=5e-7)


def test_homography_analytic_jacobian_matches_fd():
    rng = np.random.default_rng(9)
    h = np.array([[1.1, 0.05, 20.0], [-0.02, 0.97, -8.0], [5e-5, -1e-4, 1.0]])
    src = rng.uniform(-2, 2, (15, 2))
    ph = np.concatenate([src, np.ones((15, 1))], -1) @ h.T
    dst = ph[:, :2] / ph[:, 2:]
    x0 = (h.reshape(9)[:8]) * (1 + 0.01)

    fun = lambda x: cb.homography_residual_jac(x, src, dst, with_jac=False)[0]
    _, J = cb.homography_residual_jac(x0, src, dst)
    J_fd = _finite_diff(fun, x0)
    scale = np.maximum(1.0, np.abs(J_fd))
    np.testing.assert_allclose(J / scale, J_fd / scale, atol=5e-7)


def test_solve_intrinsics_cpu_recovers_gt():
    intr, obj, uv, poses = _intrinsics_problem()
    x0 = cb.intrinsics_x0(
        intr + np.array([8.0, -6.0, 4.0, -3.0, 0, 0.02, 0, 0, 0, 0]), poses
    )
    res = cb.solve_intrinsics_cpu(obj, uv, x0)
    assert res.success
    np.testing.assert_allclose(res.x[:4], intr[:4], atol=1e-6)


def test_solve_homography_cpu_recovers_gt():
    rng = np.random.default_rng(10)
    h = np.array([[1.1, 0.05, 20.0], [-0.02, 0.97, -8.0], [5e-5, -1e-4, 1.0]])
    src = rng.uniform(-2, 2, (30, 2))
    ph = np.concatenate([src, np.ones((30, 1))], -1) @ h.T
    dst = ph[:, :2] / ph[:, 2:]
    h0 = h * 1.001
    res, hm = cb.solve_homography_cpu(src, dst, h0)
    np.testing.assert_allclose(hm, h, atol=1e-9)


def test_solve_extrinsics_cpu_recovers_gt():
    pytest.importorskip("torch")  # torch-autodiff baselines; CI may lack torch
    intr = synth.default_camera()
    obj = synth.make_target_grid(4, 6, 0.05)
    rel = synth.euler_pose(0.02, -0.35, 0.01, [-0.22, 0.01, 0.015])
    r_se3_t = synth.circle_views(4, dist=1.0)
    n = obj.shape[0]
    uv = np.zeros((4, 2, n, 2))
    for v in range(4):
        for ci, cpose in enumerate([r_se3_t[v], rel @ r_se3_t[v]]):
            uv[v, ci] = synth.render_pixels(intr, cpose[None], obj)[0]
    obj_b = np.tile(obj[None, None], (4, 2, 1, 1))
    c0 = np.stack([np.eye(4), rel @ synth.euler_pose(0.004, -0.003, 0.002, [0.002, -0.001, 0.001])])
    res = cb.solve_extrinsics_cpu(
        obj_b, uv, np.tile(intr[None], (2, 1)), c0, r_se3_t
    )
    assert res.success
    w_rel, t_rel = cb.pose_to_w_t(rel)
    np.testing.assert_allclose(res.x[:3], w_rel, atol=1e-7)
    np.testing.assert_allclose(res.x[3:6], t_rel, atol=1e-7)


def test_extrinsics_plain_cost_matches_solver_cost():
    """extrinsics_unpack_x + extrinsics_plain_cost must reproduce the torch
    residual's own 0.5*sum(r^2) EXACTLY at the solution — the integrity
    check behind the config-3 same-minimum gate (bench_all.bench_extrinsics)."""
    pytest.importorskip("torch")
    from benchmarks import problems as pb

    p = pb.stereo_problems(1, views=4, noise=0.1)
    obj, uv = p["obj"][0], p["uv"][0]
    r = cb.solve_extrinsics_cpu(obj, uv, p["intr0"][0], p["c0"][0], p["r0"][0])
    v, c = obj.shape[0], obj.shape[1]
    cams, views, intrs = cb.extrinsics_unpack_x(r.x, v, c, p["intr0"][0], p["r0"][0])
    cost = cb.extrinsics_plain_cost(cams, views, intrs, obj, uv)
    np.testing.assert_allclose(cost, r.cost, rtol=1e-12)


def test_bundle_plain_cost_matches_solver_cost():
    """bundle_plain_cost must reproduce solve_bundle_cpu's own 0.5*sum(r^2)
    EXACTLY at the solution (config-4b same-minimum gate integrity)."""
    pytest.importorskip("torch")
    from benchmarks import problems as pb

    p = pb.bundle_problems(1)
    r = cb.solve_bundle_cpu(
        p["obj"][0], p["uv"][0], p["bg"][0], p["intr"], p["g0"][0], p["b0"][0]
    )
    xm, tm = np.eye(4), np.eye(4)
    xm[:3, :3] = cb.so3_exp(r.x[:3])
    xm[:3, 3] = r.x[3:6]
    tm[:3, :3] = cb.so3_exp(r.x[6:9])
    tm[:3, 3] = r.x[9:12]
    cost = cb.bundle_plain_cost(
        xm, tm, p["intr"], p["obj"][0], p["uv"][0], p["bg"][0]
    )
    np.testing.assert_allclose(cost, r.cost, rtol=1e-12)


def test_solve_handeye_cpu_recovers_gt():
    pytest.importorskip("torch")  # torch-autodiff baselines; CI may lack torch
    sim = synth.make_handeye_sequence(num_poses=10)
    g_gt = sim["g_se3_c"]
    g0 = g_gt @ synth.euler_pose(0.01, -0.008, 0.012, [0.004, -0.003, 0.002])
    res, m = cb.solve_handeye_cpu(np.asarray(sim["b_se3_g"]), np.asarray(sim["c_se3_t"]), g0)
    assert res.success
    assert synth.rot_err_deg(m, g_gt) < 1e-6
    assert synth.trans_err(m, g_gt) < 1e-8


def test_solve_bundle_cpu_recovers_gt():
    pytest.importorskip("torch")  # torch-autodiff baselines; CI may lack torch
    intr = synth.default_camera()
    obj = synth.make_target_grid(6, 8, 0.04)
    sim = synth.make_handeye_sequence(num_poses=10)
    uv = synth.render_pixels(intr, np.asarray(sim["c_se3_t"]), obj)
    obj_b = np.tile(obj[None], (10, 1, 1))
    g0 = sim["g_se3_c"] @ synth.euler_pose(0.008, -0.006, 0.01, [0.003, -0.002, 0.004])
    b0 = sim["b_se3_t"] @ synth.euler_pose(-0.005, 0.007, -0.004, [0.002, 0.003, -0.002])
    res = cb.solve_bundle_cpu(obj_b, uv, np.asarray(sim["b_se3_g"]), intr, g0, b0)
    assert res.success
    m = np.eye(4)
    m[:3, :3] = cb.so3_exp(res.x[:3])
    m[:3, 3] = res.x[3:6]
    assert synth.rot_err_deg(m, sim["g_se3_c"]) < 1e-5
    assert synth.trans_err(m, sim["g_se3_c"]) < 1e-7


def test_solve_linescan_cpu_recovers_gt_and_matches_tpu():
    """The numpy linescan baseline and the batched jnp path solve the SAME
    closed-form pipeline: both must recover the GT laser plane (noiseless)
    and agree with each other."""
    from benchmarks import problems as pb
    from calibration_tpu.parallel import batched

    camera, obj, tgt_uv, laser_uv, plane_gt = pb.linescan_problems(
        3, noise=0.0, seed=31
    )
    res = batched.linescan_batch(camera, obj, tgt_uv, laser_uv)
    plane_tpu = np.asarray(res.plane)
    assert bool(np.asarray(res.ok).all())
    # fit_plane_svd's normal sign is the SVD's (arbitrary); compare with
    # d >= 0 canonicalization
    canon = lambda p: p if p[3] >= 0 else -p
    for i in range(3):
        plane_cpu, rms = cb.solve_linescan_cpu(
            camera[i], obj[i], tgt_uv[i], laser_uv[i]
        )
        np.testing.assert_allclose(canon(plane_cpu), plane_gt[i], atol=5e-8)
        np.testing.assert_allclose(canon(plane_tpu[i]), canon(plane_cpu), atol=1e-7)
        assert rms < 1e-8
        assert float(np.asarray(res.rms_error)[i]) < 1e-8


# ---------------------------------------------------------------------------
# Analytic Jacobians for the chained-pose baselines (extrinsics, hand-eye,
# bundle): must match central finite differences, and the analytic solver
# must land in the SAME minimum as the torch.func reverse-mode oracle.
# ---------------------------------------------------------------------------

def _extrinsics_problem():
    from benchmarks import problems as pb

    p = pb.stereo_problems(1, views=4, rows=4, cols=5, noise=0.1)
    obj, uv = p["obj"][0], p["uv"][0]
    intr0, c0, r0 = p["intr0"][0], p["c0"][0], p["r0"][0]
    x0 = cb.extrinsics_pack_x0(intr0, c0, r0)
    x0 = x0 + 1e-3 * np.sin(np.arange(x0.size))  # off the solution
    return obj, uv, intr0, c0, r0, x0


def test_extrinsics_analytic_jacobian_matches_fd():
    obj, uv, intr0, c0, r0, x0 = _extrinsics_problem()
    skews = np.asarray(intr0, float)[:, 4]
    view0 = np.asarray(r0[0], float)

    fun = lambda x: cb.extrinsics_residual_jac(x, obj, uv, skews, view0, with_jac=False)[0]
    _, J = cb.extrinsics_residual_jac(x0, obj, uv, skews, view0)
    J_fd = _finite_diff(fun, x0)
    scale = np.maximum(1.0, np.abs(J_fd))
    # 2e-6: central-difference truncation on the view-pose columns (residuals
    # here are ~100x larger than the intrinsics test's); worst observed
    # deviation 7e-7 on 2/13440 entries with eps=1e-7
    np.testing.assert_allclose(J / scale, J_fd / scale, atol=2e-6)


def test_extrinsics_analytic_matches_torch_minimum():
    pytest.importorskip("torch")
    obj, uv, intr0, c0, r0, _ = _extrinsics_problem()
    ra = cb.solve_extrinsics_cpu(obj, uv, intr0, c0, r0)
    rt = cb.solve_extrinsics_cpu(obj, uv, intr0, c0, r0, backend="torch")
    assert ra.success and rt.success
    np.testing.assert_allclose(ra.cost, rt.cost, rtol=1e-10)
    # residuals at the analytic x through the torch objective would need the
    # torch residual fn; same-cost at 1e-10 from the same x0 pins the minimum


def test_handeye_analytic_jacobian_matches_fd():
    sim = synth.make_handeye_sequence(num_poses=6)
    As, Bs = cb.handeye_motion_pairs(
        np.asarray(sim["b_se3_g"]), np.asarray(sim["c_se3_t"])
    )
    w0, t0 = cb.pose_to_w_t(sim["g_se3_c"])
    x0 = np.concatenate([w0, t0]) + 1e-2 * np.cos(np.arange(6))

    fun = lambda x: cb.handeye_residual_jac(x, As, Bs, with_jac=False)[0]
    _, J = cb.handeye_residual_jac(x0, As, Bs)
    J_fd = _finite_diff(fun, x0)
    scale = np.maximum(1.0, np.abs(J_fd))
    np.testing.assert_allclose(J / scale, J_fd / scale, atol=5e-7)


def test_handeye_analytic_matches_torch_minimum():
    pytest.importorskip("torch")
    sim = synth.make_handeye_sequence(num_poses=8)
    g0 = sim["g_se3_c"] @ synth.euler_pose(0.01, -0.008, 0.012, [0.004, -0.003, 0.002])
    bg, ct = np.asarray(sim["b_se3_g"]), np.asarray(sim["c_se3_t"])
    ra, ma = cb.solve_handeye_cpu(bg, ct, g0)
    rt, mt = cb.solve_handeye_cpu(bg, ct, g0, backend="torch")
    assert ra.success and rt.success
    np.testing.assert_allclose(ra.cost, rt.cost, rtol=1e-10, atol=1e-16)
    assert synth.rot_err_deg(ma, mt) < 1e-6


def test_bundle_analytic_jacobian_matches_fd():
    from benchmarks import problems as pb

    p = pb.bundle_problems(1, num_obs=6, rows=4, cols=5, noise=0.1)
    g_inv = np.linalg.inv(np.asarray(p["bg"][0], float))
    wX, tX = cb.pose_to_w_t(p["g0"][0])
    wT, tT = cb.pose_to_w_t(p["b0"][0])
    x0 = np.concatenate([wX, tX, wT, tT]) + 1e-3 * np.sin(np.arange(12))

    obj, uv, intr = p["obj"][0], p["uv"][0], p["intr"]
    fun = lambda x: cb.bundle_residual_jac(x, obj, uv, g_inv, intr, with_jac=False)[0]
    _, J = cb.bundle_residual_jac(x0, obj, uv, g_inv, intr)
    J_fd = _finite_diff(fun, x0)
    scale = np.maximum(1.0, np.abs(J_fd))
    np.testing.assert_allclose(J / scale, J_fd / scale, atol=5e-7)


def test_bundle_analytic_matches_torch_minimum():
    pytest.importorskip("torch")
    from benchmarks import problems as pb

    p = pb.bundle_problems(1, num_obs=8, noise=0.1)
    args = (p["obj"][0], p["uv"][0], p["bg"][0], p["intr"], p["g0"][0], p["b0"][0])
    ra = cb.solve_bundle_cpu(*args)
    rt = cb.solve_bundle_cpu(*args, backend="torch")
    assert ra.success and rt.success
    np.testing.assert_allclose(ra.cost, rt.cost, rtol=1e-10)
    np.testing.assert_allclose(ra.x, rt.x, atol=1e-7)
