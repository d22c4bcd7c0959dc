"""Mesh-sharded batched solver tests on the 8-device virtual CPU mesh
(the multi-chip path: data parallelism over calibration problems).

Even when a TPU plugin owns the *default* platform (so JAX_PLATFORMS=cpu is
ignored), the explicit CPU backend still exists and honours
--xla_force_host_platform_device_count — ``jax.devices("cpu")`` yields the
8-device mesh. All meshes here are built from that backend explicitly, so the
suite runs both locally (TPU-default attachment) and in CI (CPU-only)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _mesh_cpus():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


pytestmark = pytest.mark.skipif(
    len(_mesh_cpus()) < 8,
    reason="needs an 8-device CPU mesh (--xla_force_host_platform_device_count=8)",
)

import synth
from calibration_tpu.optim import OptimOptions
from calibration_tpu.parallel import batched, sharding as sh
from calibration_tpu.ops import homography as H


def _homography_problems(b, n=24, seed=0):
    rng = np.random.default_rng(seed)
    hs, srcs, dsts = [], [], []
    for i in range(b):
        h = np.array([[1.0 + 0.05 * i, 0.02, 5.0 * i], [-0.01, 0.95, 3.0], [1e-4, -1e-4, 1.0]])
        src = rng.uniform(-2, 2, (n, 2))
        dst = np.asarray(H.apply_homography(jnp.asarray(h), jnp.asarray(src)))
        hs.append(h); srcs.append(src); dsts.append(dst)
    return np.stack(hs), np.stack(srcs), np.stack(dsts)


def test_homography_batch_sharded():
    hs, src, dst = _homography_problems(8)
    mesh = sh.make_mesh(_mesh_cpus()[:8])
    out, hm, cov, cov_ok = batched.homography_batch(
        src, dst, options=OptimOptions(max_iterations=50, compute_covariance=False), mesh=mesh
    )
    hm = np.asarray(hm)
    for i in range(8):
        np.testing.assert_allclose(hm[i], hs[i], atol=1e-8)
    assert np.asarray(out.success).all()


def test_pad_batch():
    tree = {"a": np.arange(10)[:, None].repeat(3, 1)}
    padded, real = sh.pad_batch(tree, 8)
    assert real == 10
    assert padded["a"].shape[0] == 16
    # numpy in -> numpy out: padding must not commit through the default client
    assert type(padded["a"]) is np.ndarray


def test_homography_batch_autopads_nondivisible():
    """B=10 on the 8-mesh: entry points pad to 16, shard (not replicate),
    and trim the outputs back to 10 (VERDICT round-2 weak #5 / next #7)."""
    import warnings

    hs, src, dst = _homography_problems(10)
    mesh = sh.make_mesh(_mesh_cpus()[:8])
    opts = OptimOptions(max_iterations=50, compute_covariance=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out, hm, cov, cov_ok = batched.homography_batch(src, dst, options=opts, mesh=mesh)
    assert not [w for w in caught if "REPLICATED" in str(w.message)]
    hm = np.asarray(hm)
    assert hm.shape == (10, 3, 3)
    assert np.asarray(out.success).shape == (10,)
    for i in range(10):
        np.testing.assert_allclose(hm[i], hs[i], atol=1e-8)
    # same numerics as the unsharded solve
    out2, hm2, _, _ = batched.homography_batch(src, dst, options=opts)
    np.testing.assert_allclose(hm, np.asarray(hm2), atol=1e-12)


def test_extrinsics_batch_sharded():
    intr = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.05)
    rel = synth.euler_pose(0.02, -0.35, 0.01, [-0.22, 0.01, 0.015])
    r_se3_t = synth.circle_views(6, dist=1.0)
    n = obj.shape[0]
    uv = np.zeros((6, 2, n, 2))
    for v in range(6):
        for ci, cpose in enumerate([r_se3_t[v], rel @ r_se3_t[v]]):
            uv[v, ci] = synth.render_pixels(intr, cpose[None], obj)[0]
    b = 8
    obj_b = np.tile(obj[None, None, None], (b, 6, 2, 1, 1))
    uv_b = np.tile(uv[None], (b, 1, 1, 1, 1))
    cams0 = np.tile(intr[None, None], (b, 2, 1))
    c0 = np.tile(np.stack([np.eye(4), rel])[None], (b, 1, 1, 1))
    r0 = np.tile(r_se3_t[None], (b, 1, 1, 1))

    from calibration_tpu.optim import ExtrinsicOptions

    mesh = sh.make_mesh(_mesh_cpus()[:8])
    out, intr_est, c_se3_r, rt, cov, cov_ok = batched.extrinsics_batch(
        obj_b, uv_b, cams0, c0, r0,
        opts=ExtrinsicOptions(core=OptimOptions(max_iterations=40, compute_covariance=False)),
        mesh=mesh,
    )
    assert np.asarray(out.success).all()
    np.testing.assert_allclose(
        np.asarray(intr_est)[:, :, :4], np.tile(intr[:4], (b, 2, 1)), atol=1e-4
    )


def test_intrinsics_batch_sharded():
    intr = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.05)
    poses = synth.circle_views(6)
    uv = synth.render_pixels(intr, poses, obj)
    b = 8
    obj_b = np.tile(obj[None, None], (b, 6, 1, 1))
    uv_b = np.tile(uv[None], (b, 1, 1, 1))

    from calibration_tpu.optim import IntrinsicsOptimOptions

    mesh = sh.make_mesh(_mesh_cpus()[:8])
    seed, out = batched.intrinsics_batch(
        obj_b, uv_b,
        opts=IntrinsicsOptimOptions(core=OptimOptions(max_iterations=40, compute_covariance=False)),
        mesh=mesh,
    )
    lm_out, intr_est, pose_est, view_err, cov, cov_ok = out
    intr_est = np.asarray(intr_est)
    assert intr_est.shape == (b, 10)
    np.testing.assert_allclose(intr_est[:, :4], np.tile(intr[:4], (b, 1)), atol=1e-4)
    assert np.asarray(view_err).max() < 1e-5


def test_mesh_devices_probe_rejects_untransferable_backend(monkeypatch):
    """A backend that ENUMERATES n devices but fails host->device transfers
    (the round-2 driver failure: version-skewed libtpu tunnel raises
    FAILED_PRECONDITION on every device_put) must be skipped by
    mesh_devices(probe=True) in favour of the healthy CPU mesh."""

    class _SkewedDevice:
        platform = "tpu"  # enumerable, but any transfer to it raises

    real_devices = jax.devices

    def fake_devices(platform=None):
        if platform is None:
            return [_SkewedDevice() for _ in range(8)]
        return real_devices(platform)

    monkeypatch.setattr(sh.jax, "devices", fake_devices)
    try:
        # without the probe the skewed pool wins (documents the hazard)
        assert sh.mesh_devices(8)[0].platform == "tpu"
        picked = sh.mesh_devices(8, probe=True)
    finally:
        monkeypatch.undo()
    assert picked is not None
    assert all(d.platform == "cpu" for d in picked)
    assert len(picked) == 8


def test_intrinsics_batch_two_phase_matches_single(monkeypatch):
    """The two-phase compacted solve (phase A full width, unconverged lanes
    re-batched at quarter width — parallel/batched.py::
    _intrinsics_batch_phased_jit) must land on the same minimum as the
    single-phase solve, with covariance. CAP is pinned low so real lanes
    flow into the continuation, exercising the compact/merge path."""
    intr = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.05)
    poses = synth.circle_views(6)
    rng = np.random.default_rng(3)
    b = 8
    obj_b = np.tile(obj[None, None], (b, 6, 1, 1))
    uv_b = np.stack(
        [np.asarray(synth.render_pixels(intr, poses, obj, noise=0.3, rng=rng)) for _ in range(b)]
    )

    from calibration_tpu.optim import IntrinsicsOptimOptions

    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=30, compute_covariance=True)
    )
    _, out1 = batched.intrinsics_batch(obj_b, uv_b, opts=opts, two_phase=False)
    monkeypatch.setattr(batched, "TWO_PHASE_CAP_A", 2)
    _, out2 = batched.intrinsics_batch(obj_b, uv_b, opts=opts, two_phase=True)

    lm1, intr1, poses1, err1, cov1, ok1 = out1
    lm2, intr2, poses2, err2, cov2, ok2 = out2
    assert np.asarray(lm1.success).all() and np.asarray(lm2.success).all()
    # same minimum: the strong invariants are cost and per-view RMS parity.
    # Parameters agree modulo conditioning — the phase boundary resets
    # damping, so each run stops at a slightly different point of the same
    # eps=1e-9 basin, and the weakly identifiable k3/p1/p2 directions
    # (near-flat curvature on a 5x7 target) carry ~1e-4-relative spread.
    np.testing.assert_allclose(np.asarray(lm2.cost), np.asarray(lm1.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(err2), np.asarray(err1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(intr2), np.asarray(intr1), rtol=1e-3, atol=1e-6
    )
    # focal/principal point (well-conditioned) agree much tighter
    np.testing.assert_allclose(
        np.asarray(intr2)[:, :4], np.asarray(intr1)[:, :4], rtol=1e-6
    )
    assert np.asarray(ok2).all()
    np.testing.assert_allclose(np.asarray(cov2), np.asarray(cov1), rtol=1e-2, atol=1e-5)
    # phase-B iterations accumulate on top of phase A for re-solved lanes
    assert (np.asarray(lm2.iterations) >= 2).all()


def test_extrinsics_batch_phased_matches_single(monkeypatch):
    """Phased stereo-extrinsics (cap + quarter-width continuation,
    batched._extrinsics_batch_phased_jit) must land on the same minimum as
    single-phase. Cap pinned low so real lanes flow through the
    compact/merge path."""
    intr = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.05)
    rel = synth.euler_pose(0.02, -0.35, 0.01, [-0.22, 0.01, 0.015])
    r_se3_t = synth.circle_views(6, dist=1.0)
    n = obj.shape[0]
    rng = np.random.default_rng(5)
    b = 8
    uv_b = np.zeros((b, 6, 2, n, 2))
    for v in range(6):
        for ci, cpose in enumerate([r_se3_t[v], rel @ r_se3_t[v]]):
            base = synth.render_pixels(intr, cpose[None], obj)[0]
            uv_b[:, v, ci] = base[None] + rng.normal(0, 0.2, (b, n, 2))
    obj_b = np.tile(obj[None, None, None], (b, 6, 2, 1, 1))
    cams0 = np.tile(intr[None, None], (b, 2, 1))
    c0 = np.tile(np.stack([np.eye(4), rel])[None], (b, 1, 1, 1))
    r0 = np.tile(r_se3_t[None], (b, 1, 1, 1))

    from calibration_tpu.optim import ExtrinsicOptions

    opts = ExtrinsicOptions(
        core=OptimOptions(max_iterations=40, compute_covariance=False)
    )
    out1 = batched.extrinsics_batch(
        obj_b, uv_b, cams0, c0, r0, opts=opts, two_phase=False
    )
    monkeypatch.setattr(batched, "EXTRINSICS_PHASE_CAP", 2)
    out2 = batched.extrinsics_batch(
        obj_b, uv_b, cams0, c0, r0, opts=opts, two_phase=True
    )
    lm1, i1, c1, r1, cov1, _ = out1
    lm2, i2, c2, r2, cov2, _ = out2
    assert np.asarray(lm1.success).all() and np.asarray(lm2.success).all()
    np.testing.assert_allclose(np.asarray(lm2.cost), np.asarray(lm1.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-6)
    assert np.asarray(cov2).shape == np.asarray(cov1).shape


def test_bundle_batch_phased_matches_single(monkeypatch):
    """Phased bundle (batched._bundle_batch_phased_jit) must land on the
    same minimum as single-phase."""
    intr_gt = synth.default_camera()
    obj = synth.make_target_grid(8, 11, 0.03)
    sim = synth.make_handeye_sequence(num_poses=12)
    rng = np.random.default_rng(9)
    b = 8
    o = sim["c_se3_t"].shape[0]
    base_uv = synth.render_pixels(intr_gt, sim["c_se3_t"], obj)
    uv_b = np.asarray(base_uv)[None] + rng.normal(0, 0.2, (b,) + base_uv.shape)
    tile = lambda x: np.tile(np.asarray(x)[None], (b,) + (1,) * np.asarray(x).ndim)
    obj_b = tile(np.tile(obj[None], (o, 1, 1)))
    bg_b = tile(sim["b_se3_g"])
    cam_idx = np.zeros((b, o), int)
    intr0 = tile(intr_gt[None])
    g0 = tile(synth.euler_pose(0.11, -0.21, 0.16, [0.022, -0.032, 0.052])[None])
    t0 = tile(synth.euler_pose(0.06, 0.02, -0.07, [0.41, -0.09, 0.19]))

    from calibration_tpu.optim import BundleOptions

    opts = BundleOptions(core=OptimOptions(max_iterations=40, compute_covariance=False))
    out1 = batched.bundle_batch(
        obj_b, uv_b, bg_b, cam_idx, intr0, g0, t0, opts=opts, two_phase=False
    )
    monkeypatch.setattr(batched, "BUNDLE_PHASE_CAP", 2)
    out2 = batched.bundle_batch(
        obj_b, uv_b, bg_b, cam_idx, intr0, g0, t0, opts=opts, two_phase=True
    )
    lm1, i1, g1, t1, cov1, _ = out1
    lm2, i2, g2, t2, cov2, _ = out2
    assert np.asarray(lm1.success).all() and np.asarray(lm2.success).all()
    np.testing.assert_allclose(np.asarray(lm2.cost), np.asarray(lm1.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-6)
    assert np.asarray(cov2).shape == np.asarray(cov1).shape


def test_homography_batch_phased_matches_single(monkeypatch):
    """Phased homography (batched._homography_batch_phased_jit) must land on
    the same minimum as single-phase, INCLUDING covariance (deferred to a
    final pass over the merged solution). Cap pinned low so real lanes flow
    through the compact/merge path."""
    rng = np.random.default_rng(11)
    b, n = 8, 24
    hs = np.tile(np.eye(3), (b, 1, 1))
    hs[:, 0, 0] += rng.uniform(-0.2, 0.2, b)
    hs[:, 1, 1] += rng.uniform(-0.2, 0.2, b)
    hs[:, :2, 2] = rng.uniform(-5, 5, (b, 2))
    hs[:, 2, :2] = rng.uniform(-1e-4, 1e-4, (b, 2))
    src = rng.uniform(-2, 2, (b, n, 2))
    ph = np.concatenate([src, np.ones((b, n, 1))], -1) @ np.swapaxes(hs, 1, 2)
    dst = ph[..., :2] / ph[..., 2:] + rng.normal(0, 0.05, (b, n, 2))

    opts = OptimOptions(max_iterations=40, compute_covariance=True)
    lm1, h1, cov1, ok1 = batched.homography_batch(src, dst, options=opts, two_phase=False)
    monkeypatch.setattr(batched, "HOMOG_PHASE_CAP", 2)
    lm2, h2, cov2, ok2 = batched.homography_batch(src, dst, options=opts, two_phase=True)
    assert np.asarray(lm1.success).all() and np.asarray(lm2.success).all()
    np.testing.assert_allclose(np.asarray(lm2.cost), np.asarray(lm1.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-8)
    assert np.asarray(ok2).all() == np.asarray(ok1).all()
    np.testing.assert_allclose(np.asarray(cov2), np.asarray(cov1), rtol=1e-4, atol=1e-12)


def test_intrinsics_facade_batch_phased_matches_single(monkeypatch):
    """The fused facade program's phased LM (schedule threaded into
    batched._intrinsics_facade_batch_jit — the 64-rig pipeline's intrinsics
    stage) must land on the same minimum as the single-phase facade program,
    including the deferred covariance and the ragged view_valid freezing.
    Cap pinned low so real lanes flow through the compact/merge path."""
    intr = synth.default_camera()
    obj = synth.make_target_grid(5, 7, 0.05)
    poses = synth.circle_views(6)
    rng = np.random.default_rng(7)
    b = 8
    obj_b = np.tile(obj[None, None], (b, 6, 1, 1))
    uv_b = np.stack(
        [np.asarray(synth.render_pixels(intr, poses, obj, noise=0.3, rng=rng)) for _ in range(b)]
    )
    # ragged fleet: the last camera contributes only 5 of the 6 view rows
    view_valid = np.ones((b, 6))
    view_valid[-1, 5] = 0.0

    from calibration_tpu.optim import IntrinsicsOptimOptions

    opts = IntrinsicsOptimOptions(
        core=OptimOptions(max_iterations=30, compute_covariance=True)
    )
    seed1, ok1, out1, rms1 = batched.intrinsics_facade_batch(
        obj_b, uv_b, view_valid=view_valid, opts=opts, two_phase=False
    )
    monkeypatch.setattr(batched, "TWO_PHASE_CAP_A", 2)
    seed2, ok2, out2, rms2 = batched.intrinsics_facade_batch(
        obj_b, uv_b, view_valid=view_valid, opts=opts, two_phase=True
    )
    lm1, intr1, poses1, err1, cov1, cok1 = out1
    lm2, intr2, poses2, err2, cov2, cok2 = out2
    assert np.asarray(lm1.success).all() and np.asarray(lm2.success).all()
    np.testing.assert_allclose(np.asarray(lm2.cost), np.asarray(lm1.cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(err2), np.asarray(err1), atol=1e-5)
    # focal/principal point: same eps=1e-9 basin; the phase boundary resets
    # damping so the stop points spread a few 1e-6 relative (cost gate above
    # is the same-minimum criterion)
    np.testing.assert_allclose(
        np.asarray(intr2)[:, :4], np.asarray(intr1)[:, :4], rtol=5e-6
    )
    # seed + pose gating are pre-LM and must be bit-identical
    np.testing.assert_array_equal(np.asarray(ok2), np.asarray(ok1))
    np.testing.assert_allclose(np.asarray(seed2.kmtx), np.asarray(seed1.kmtx), rtol=0, atol=0)
    assert np.asarray(cok2).all()
    np.testing.assert_allclose(np.asarray(cov2), np.asarray(cov1), rtol=1e-2, atol=1e-5)
    # f32 QA metric recomputed from two same-basin (~1e-6-rel apart)
    # solutions: pixel-scale agreement is the contract, not ulp-level
    np.testing.assert_allclose(np.asarray(rms2), np.asarray(rms1), rtol=1e-3, atol=1e-5)


def test_homography_batch_f32_seed_matches_f64_seed():
    """The fused f32 DLT seed (homography_batch default) must land the f64
    LM on the same minimum as an f64 seed: same cost, same H to the LM
    tolerance, on both noiseless and noisy problems (noiseless exercises
    the dtype-aware gram shift in ops.linalg.smallest_singular_vector —
    a f32 Cholesky of an exactly singular gram NaNs without it)."""
    hs, src, dst = _homography_problems(8)  # noiseless: H recovered exactly
    opts = OptimOptions(max_iterations=50, compute_covariance=False)
    lm32, h32, _, _ = batched.homography_batch(src, dst, options=opts, seed_precision="f32")
    lm64, h64, _, _ = batched.homography_batch(src, dst, options=opts, seed_precision="f64")
    assert np.asarray(lm32.success).all() and np.asarray(lm64.success).all()
    for i in range(8):
        np.testing.assert_allclose(np.asarray(h32)[i], hs[i], atol=1e-8)
    np.testing.assert_allclose(np.asarray(h32), np.asarray(h64), atol=1e-8)

    rng = np.random.default_rng(23)
    dstn = dst + rng.normal(0, 0.05, dst.shape)
    lm32n, h32n, _, _ = batched.homography_batch(src, dstn, options=opts, seed_precision="f32")
    lm64n, h64n, _, _ = batched.homography_batch(src, dstn, options=opts, seed_precision="f64")
    np.testing.assert_allclose(
        np.asarray(lm32n.cost), np.asarray(lm64n.cost), rtol=1e-10
    )
    np.testing.assert_allclose(np.asarray(h32n), np.asarray(h64n), atol=1e-7)


def test_homography_batch_f32_seed_degenerate_lane_stays_finite():
    """A degenerate lane (all points collinear — the DLT gram is rank-
    deficient beyond the usual 1-dim null space) must not poison the f32
    seed path with NaNs: the dtype-aware gram shift keeps the Cholesky
    finite, and healthy lanes in the same batch still recover their H."""
    hs, src, dst = _homography_problems(8)
    # lane 3: collinear points (x, 2x) — no unique homography exists
    t = np.linspace(-1, 1, src.shape[1])
    src = src.copy(); dst = dst.copy()
    src[3, :, 0] = t; src[3, :, 1] = 2 * t
    dst[3] = src[3]
    opts = OptimOptions(max_iterations=30, compute_covariance=False)
    lm, hm, _, _ = batched.homography_batch(src, dst, options=opts, seed_precision="f32")
    hm = np.asarray(hm)
    # healthy lanes unaffected
    for i in [0, 1, 2, 4, 5, 6, 7]:
        np.testing.assert_allclose(hm[i], hs[i], atol=1e-8)
    # the degenerate lane yields SOME finite matrix (garbage-in, finite-out
    # — degeneracy detection is the RANSAC layer's job, ransac.h:100-119)
    assert np.isfinite(hm[3]).all()
