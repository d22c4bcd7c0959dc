"""Linear estimator tests (reference: tests/unit/homography_test.cpp,
intrinsics_estimate_test.cpp, posefromhomography_test.cpp, planefit_test.cpp,
handeye_test.cpp DLT parts)."""

import numpy as np
import jax.numpy as jnp

import synth
from calibration_tpu.models import pinhole
from calibration_tpu.ops import (
    extrinsics_linear,
    handeye_linear,
    homography as H,
    intrinsics_linear,
    planarpose,
    planefit,
    se3,
    zhang,
)


def _exact_h():
    rng = np.random.default_rng(2)
    h = np.array([[1.2, 0.1, 30.0], [-0.05, 0.95, 12.0], [1e-4, -2e-4, 1.0]])
    src = rng.uniform(-1, 1, (24, 2)) * np.array([4.0, 3.0])
    dst = np.asarray(H.apply_homography(jnp.asarray(h), jnp.asarray(src)))
    return h, src, dst


def test_homography_dlt_exact():
    h, src, dst = _exact_h()
    h_est = np.asarray(H.estimate_homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(h_est, h, atol=1e-9)


def test_homography_dlt_masked():
    h, src, dst = _exact_h()
    # poison the masked-out points; estimate must be unaffected
    dst2 = dst.copy()
    dst2[20:] += 100.0
    mask = np.ones(24, bool)
    mask[20:] = False
    h_est = np.asarray(
        H.estimate_homography_dlt(jnp.asarray(src), jnp.asarray(dst2), jnp.asarray(mask))
    )
    np.testing.assert_allclose(h_est, h, atol=1e-9)


def test_symmetric_transfer_error_zero_for_exact():
    h, src, dst = _exact_h()
    r = np.asarray(
        H.symmetric_transfer_error(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst))
    )
    assert r.max() < 1e-9


def test_collinearity_check():
    pts = jnp.asarray(np.array([[0.0, 0], [1, 0], [2, 0], [1, 1]]))
    assert bool(H.has_near_collinear_triplet(pts))
    pts_ok = jnp.asarray(np.array([[0.0, 0], [1, 0], [0, 1], [1, 1]]))
    assert not bool(H.has_near_collinear_triplet(pts_ok))


def test_pose_from_homography_normalized():
    # build H = [r1 r2 t] from a known pose, decompose
    pose = synth.euler_pose(0.2, -0.3, 0.1, [0.1, -0.05, 1.4])
    hm = np.stack([pose[:3, 0], pose[:3, 1], pose[:3, 3]], axis=1)
    est = np.asarray(planarpose.pose_from_homography_normalized(jnp.asarray(hm / hm[2, 2])))
    # rot_err_deg goes through arccos(trace), whose f64 roundoff floor is
    # sqrt(2*eps) ~ 2e-8 rad ~ 1.2e-6 deg — 1e-8 deg only passes when the
    # recomposed rotation is bit-exact (backend-dependent), so gate at the
    # honest arccos floor
    assert synth.rot_err_deg(est, pose) < 5e-6
    assert synth.trans_err(est, pose) < 1e-8


def test_pose_from_homography_pixel_and_flip():
    kmtx = jnp.asarray([600.0, 610.0, 320.0, 240.0, 0.0])
    pose = synth.euler_pose(0.15, 0.25, -0.1, [0.05, 0.1, 1.2])
    hrt = np.stack([pose[:3, 0], pose[:3, 1], pose[:3, 3]], axis=1)
    k33 = np.asarray(
        [[600.0, 0.0, 320.0], [0.0, 610.0, 240.0], [0, 0, 1]]
    )
    hm = k33 @ hrt
    # also test the t_z<0 flip branch (posefromhomography_test.cpp:9-64)
    for sign in (1.0, -1.0):
        est, scale, cond, ok = planarpose.pose_from_homography_pixel(kmtx, jnp.asarray(sign * hm))
        assert bool(ok)
        est = np.asarray(est)
        assert synth.rot_err_deg(est, pose) < 1e-8
        assert synth.trans_err(est, pose) < 1e-8


def test_estimate_planar_pose_pixels():
    intr = jnp.asarray(synth.default_camera()).at[5:].set(0.0)  # no distortion
    obj = synth.make_target_grid(5, 7, 0.05)
    pose = synth.euler_pose(0.2, -0.15, 0.05, [0.02, 0.04, 0.9])
    uv = synth.render_pixels(np.asarray(intr), pose[None], obj)[0]
    est = np.asarray(
        planarpose.estimate_planar_pose(jnp.asarray(obj), jnp.asarray(uv), intr[:5])
    )
    assert synth.rot_err_deg(est, pose) < 1e-7
    assert synth.trans_err(est, pose) < 1e-8


def test_zhang_intrinsics_recovery():
    intr = jnp.asarray(synth.default_camera()).at[5:].set(0.0)
    obj = synth.make_target_grid(6, 8, 0.04)
    poses = synth.circle_views(8)
    uv = synth.render_pixels(np.asarray(intr), poses, obj)
    res = intrinsics_linear.estimate_intrinsics(
        jnp.asarray(np.tile(obj[None], (8, 1, 1))), jnp.asarray(uv)
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.kmtx), np.asarray(intr[:5]), rtol=1e-6, atol=1e-4)
    # per-view poses recovered
    for v in range(8):
        assert synth.rot_err_deg(np.asarray(res.c_se3_t[v]), poses[v]) < 1e-4


def test_zhang_masked_views_match_subset():
    intr = jnp.asarray(synth.default_camera()).at[5:].set(0.0)
    obj = synth.make_target_grid(6, 8, 0.04)
    poses = synth.circle_views(8)
    uv = synth.render_pixels(np.asarray(intr), poses, obj)
    hs = H.estimate_homography_dlt(
        jnp.asarray(np.tile(obj[None], (8, 1, 1))), jnp.asarray(uv)
    )
    k_all, ok_all = zhang.zhang_intrinsics_from_hs(hs[:6])
    mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 0, 0], bool))
    k_masked, ok_m = zhang.zhang_intrinsics_from_hs(hs, mask)
    assert bool(ok_all) and bool(ok_m)
    np.testing.assert_allclose(np.asarray(k_masked), np.asarray(k_all), atol=1e-9)


def test_estimate_intrinsics_linear():
    rng = np.random.default_rng(5)
    kmtx = np.array([700.0, 710.0, 330.0, 250.0, 0.0])
    xy = rng.uniform(-0.4, 0.4, (60, 2))
    uv = np.stack(
        [kmtx[0] * xy[:, 0] + kmtx[2], kmtx[1] * xy[:, 1] + kmtx[3]], axis=-1
    )
    est, ok = intrinsics_linear.estimate_intrinsics_linear(jnp.asarray(xy), jnp.asarray(uv))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(est), kmtx, atol=1e-9)


def test_estimate_intrinsics_linear_iterative():
    rng = np.random.default_rng(6)
    intr = synth.default_camera()
    xy = rng.uniform(-0.35, 0.35, (120, 2))
    uv = np.asarray(pinhole.project_normalized(jnp.asarray(intr), jnp.asarray(xy)))
    kmtx, coeffs, ok = intrinsics_linear.estimate_intrinsics_linear_iterative(
        jnp.asarray(xy), jnp.asarray(uv), num_radial=2
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(kmtx)[:4], intr[:4], rtol=2e-2)


def test_plane_fit_svd():
    rng = np.random.default_rng(8)
    n = np.array([0.3, -0.5, 0.81])
    n /= np.linalg.norm(n)
    d = -0.7
    basis = np.linalg.svd(n[None])[2][1:]
    pts = (-d) * n + rng.uniform(-1, 1, (50, 2)) @ basis
    plane = np.asarray(planefit.fit_plane_svd(jnp.asarray(pts)))
    if plane[:3] @ n < 0:
        plane = -plane
    np.testing.assert_allclose(plane[:3], n, atol=1e-9)
    np.testing.assert_allclose(plane[3], d, atol=1e-9)


def test_handeye_dlt_recovery():
    sim = synth.make_handeye_sequence(num_poses=10)
    est, ok = handeye_linear.estimate_handeye_dlt(
        jnp.asarray(sim["b_se3_g"]), jnp.asarray(sim["c_se3_t"]), 1.0
    )
    assert bool(ok)
    # 5e-6 deg = 9e-8 rad: noise-free DLT recovery is roundoff-limited, and
    # the exact roundoff depends on the Cholesky summation order in
    # ridge_llsq (ops/linalg.py unrolled small-n path) — 1e-6 deg was
    # over-tight to one particular op ordering
    assert synth.rot_err_deg(np.asarray(est), sim["g_se3_c"]) < 5e-6
    assert synth.trans_err(np.asarray(est), sim["g_se3_c"]) < 1e-6


def test_extrinsics_dlt():
    intr = synth.default_camera()
    intr[5:] = 0.0
    obj = synth.make_target_grid(5, 7, 0.05)
    # two cameras: cam0 at origin-ish, cam1 offset
    c1_se3_c0 = synth.euler_pose(0.02, -0.4, 0.01, [-0.25, 0.0, 0.02])
    views = synth.circle_views(6, dist=1.0)
    obj_b = np.tile(obj[None, None], (6, 2, 1, 1))
    norm_uv = np.zeros((6, 2, obj.shape[0], 2))
    from calibration_tpu.models import camera_matrix as cm
    for v in range(6):
        p0 = views[v]
        p1 = c1_se3_c0 @ p0
        for ci, pose in enumerate([p0, p1]):
            uv = synth.render_pixels(intr, pose[None], obj)[0]
            norm_uv[v, ci] = np.asarray(cm.normalize(jnp.asarray(intr[:5]), jnp.asarray(uv)))
    res = extrinsics_linear.estimate_extrinsic_dlt(jnp.asarray(obj_b), jnp.asarray(norm_uv))
    assert synth.rot_err_deg(np.asarray(res.c_se3_r[1]), c1_se3_c0) < 1e-5
    assert synth.trans_err(np.asarray(res.c_se3_r[1]), c1_se3_c0) < 1e-6
    for v in range(6):
        assert synth.rot_err_deg(np.asarray(res.r_se3_t[v]), views[v]) < 1e-5


def test_estimate_intrinsics_padded_views_nan_proof():
    """Fully-masked (padded) views can yield NaN homographies (all-zero DLT
    null vector is backend-dependent garbage); the Zhang system must zero
    those rows by SELECTION, not weight-multiplication (NaN * 0 = NaN) —
    regression for the local-CPU failure where every facade seed collapsed
    to the sanitize fallback. The padded estimate must equal the unpadded
    one and ok must stay True."""
    intr = synth.default_camera()
    obj = np.asarray(synth.make_target_grid(6, 8, 0.04))
    poses = synth.circle_views(8)
    uv = np.asarray(synth.render_pixels(intr, poses, obj))
    obj_b = np.tile(obj[None], (8, 1, 1))

    ref = intrinsics_linear.estimate_intrinsics(jnp.asarray(obj_b), jnp.asarray(uv))
    assert bool(ref.ok)

    vpad, npad = 16, 64
    obj_p = np.pad(obj_b, ((0, vpad - 8), (0, npad - 48), (0, 0)))
    uv_p = np.pad(uv, ((0, vpad - 8), (0, npad - 48), (0, 0)))
    mask = np.zeros((vpad, npad))
    mask[:8, :48] = 1.0
    res = intrinsics_linear.estimate_intrinsics(
        jnp.asarray(obj_p), jnp.asarray(uv_p), jnp.asarray(mask)
    )
    assert bool(res.ok), "padded views must not poison the Zhang system"
    np.testing.assert_allclose(np.asarray(res.kmtx), np.asarray(ref.kmtx), atol=1e-9)
    assert np.asarray(res.h_ok)[:8].all() and not np.asarray(res.h_ok)[8:].any()
