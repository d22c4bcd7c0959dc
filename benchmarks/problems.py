"""Synthetic problem generators for the five BASELINE.md benchmark configs.

Ground-truth-first, mirroring the reference's test fixtures
(tests/unit/utils.h): build cameras/poses, render pixels, add noise. All
generation is untimed; both the TPU batch path and the sequential CPU
baseline consume the SAME problems and the SAME initial guesses, so the
reported parity deltas compare two solvers of one minimization problem.
"""

from __future__ import annotations

import numpy as np

from . import cpu_baseline as cb


def np_project(intr, pc):
    """Pinhole + Brown-Conrady forward projection in numpy. intr: (10,)."""
    fx, fy, cx, cy, sk = intr[:5]
    xd, yd, _, _ = cb.distort_with_jac(pc[..., 0] / pc[..., 2], pc[..., 1] / pc[..., 2], intr[5:])
    return np.stack([fx * xd + sk * yd + cx, fy * yd + cy], -1)


def np_project_scheimpflug(intr12, pc):
    """Scheimpflug (tilted-sensor) forward projection in numpy — the exact
    mirror of models/scheimpflug.py::project (same Ry*Rx rotation, ray/plane
    intersection, distorted delta + linear principal shift). Data generators
    must stay pure numpy: one jnp call per view per rig costs a remote
    dispatch round trip each (a 256-rig dataset build took ~20 min and
    stalled bench config 5S)."""
    tx, ty = intr12[10], intr12[11]
    sx, cx_ = np.sin(tx), np.cos(tx)
    sy, cy_ = np.sin(ty), np.cos(ty)
    rot = np.array(
        [
            [cy_, sx * sy, cx_ * sy],
            [0.0, cx_, -sx],
            [-sy, sx * cy_, cx_ * cy_],
        ]
    )
    axis, base, normal = rot[:, 0], rot[:, 1], rot[:, 2]
    sden = pc @ normal
    mx = (pc @ axis) / sden
    my = (pc @ base) / sden
    mx0 = rot[2, 0] / rot[2, 2]
    my0 = rot[2, 1] / rot[2, 2]

    fx, fy, cx, cy, sk = intr12[:5]
    xd, yd, _, _ = cb.distort_with_jac(mx - mx0, my - my0, intr12[5:10])
    px = np.stack([fx * xd + sk * yd, fy * yd], -1)
    shift = np.array([fx * mx0 + sk * my0 + cx, fy * my0 + cy])
    return px + shift


def grid(rows, cols, pitch):
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    pts = np.stack([xs.ravel() * pitch, ys.ravel() * pitch], -1)
    return pts - pts.mean(0)


def pose(w, t):
    m = np.eye(4)
    m[:3, :3] = cb.so3_exp(np.asarray(w, float))
    m[:3, 3] = t
    return m


def circle_views(num, radius=0.4, dist=0.9, tilt=0.3, phase=0.0):
    out = []
    for i in range(num):
        a = 2 * np.pi * i / num + phase
        out.append(
            pose(
                [tilt * np.cos(a), tilt * np.sin(a), 0.1 * np.sin(2 * a)],
                [0.06 * np.cos(a), 0.06 * np.sin(a), dist + 0.08 * np.sin(a)],
            )
        )
    return np.stack(out)


def render(intr, c_se3_t, obj, noise, rng):
    obj3 = np.concatenate([obj, np.zeros((obj.shape[0], 1))], -1)
    pc = np.einsum("vij,nj->vni", c_se3_t[:, :3, :3], obj3) + c_se3_t[:, None, :3, 3]
    uv = np_project(intr, pc)
    if noise > 0:
        uv = uv + rng.normal(0, noise, uv.shape)
    return uv


# --- config 1: homography -------------------------------------------------

def homography_problems(batch, n=24, noise=0.1, seed=11):
    rng = np.random.default_rng(seed)
    hs = np.tile(np.eye(3), (batch, 1, 1))
    hs[:, 0, 0] = 1.0 + rng.uniform(-0.2, 0.2, batch)
    hs[:, 1, 1] = 1.0 + rng.uniform(-0.2, 0.2, batch)
    hs[:, 0, 1] = rng.uniform(-0.05, 0.05, batch)
    hs[:, 1, 0] = rng.uniform(-0.05, 0.05, batch)
    hs[:, :2, 2] = rng.uniform(-10, 10, (batch, 2))
    hs[:, 2, :2] = rng.uniform(-2e-4, 2e-4, (batch, 2))
    src = rng.uniform(-2, 2, (batch, n, 2))
    ph = np.concatenate([src, np.ones((batch, n, 1))], -1) @ np.swapaxes(hs, 1, 2)
    dst = ph[..., :2] / ph[..., 2:]
    dst = dst + rng.normal(0, noise, dst.shape)
    return hs, src, dst


# --- config 3: stereo extrinsics -------------------------------------------

def stereo_problems(batch, views=8, rows=5, cols=7, noise=0.2, seed=13):
    rng = np.random.default_rng(seed)
    obj = grid(rows, cols, 0.05)
    n = obj.shape[0]
    intr = np.concatenate([[600.0, 610.0, 320.0, 240.0, 0.0], [-0.12, 0.04, 0.0, 1e-4, -1e-4]])
    rel_gt = np.stack(
        [pose([0.02, -0.3 - 0.001 * i, 0.01], [-0.2 - 1e-4 * i, 0.01, 0.015]) for i in range(batch)]
    )
    uv = np.zeros((batch, views, 2, n, 2))
    rts = np.zeros((batch, views, 4, 4))
    for i in range(batch):
        rt = circle_views(views, dist=1.0, phase=0.03 * i)
        rts[i] = rt
        uv[i, :, 0] = render(intr, rt, obj, noise, rng)
        uv[i, :, 1] = render(intr, rel_gt[i] @ rt, obj, noise, rng)
    obj_b = np.tile(obj[None, None, None], (batch, views, 2, 1, 1))
    cams0 = np.tile(intr[None, None], (batch, 2, 1))
    # shared perturbed inits for both solvers
    dp = pose([0.004, -0.003, 0.002], [0.003, -0.002, 0.001])
    c0 = np.stack([np.stack([np.eye(4), rel_gt[i] @ dp]) for i in range(batch)])
    r0 = rts.copy()
    return dict(obj=obj_b, uv=uv, intr0=cams0, c0=c0, r0=r0, rel_gt=rel_gt)


# --- configs 4/5: hand-eye + bundle ----------------------------------------

def handeye_sequence(num_poses, rng, g_se3_c, b_se3_t):
    """Physically-constructed sequence: draw camera->target views then derive
    gripper poses (CLAUDE.md invariant: random gripper poses put the target
    behind the camera)."""
    b_se3_g, c_se3_t = [], []
    for _ in range(num_poses):
        ang = rng.uniform(-0.4, 0.4, 3)
        tr = rng.uniform(-0.08, 0.08, 3) + np.array([0.0, 0.0, 0.7])
        ct = pose(ang, tr)
        bg = b_se3_t @ np.linalg.inv(ct) @ np.linalg.inv(g_se3_c)
        b_se3_g.append(bg)
        c_se3_t.append(ct)
    return np.stack(b_se3_g), np.stack(c_se3_t)


def handeye_problems(batch, num_poses=20, seed=17):
    rng = np.random.default_rng(seed)
    g_gts, bgs, cts = [], [], []
    for i in range(batch):
        g = pose([0.1 + 1e-3 * i, -0.2, 0.15], [0.02, -0.03, 0.05])
        bt = pose([0.05, 0.03, -0.08], [0.4, -0.1, 0.2])
        bg, ct = handeye_sequence(num_poses, rng, g, bt)
        g_gts.append(g)
        bgs.append(bg)
        cts.append(ct)
    return np.stack(g_gts), np.stack(bgs), np.stack(cts)


def bundle_problems(batch, num_obs=20, rows=8, cols=11, noise=0.2, seed=19):
    rng = np.random.default_rng(seed)
    obj = grid(rows, cols, 0.03)
    intr = np.concatenate([[600.0, 610.0, 320.0, 240.0, 0.0], [-0.12, 0.04, 0.0, 1e-4, -1e-4]])
    out = dict(g_gt=[], b_gt=[], bg=[], uv=[], g0=[], b0=[])
    dp = pose([0.008, -0.006, 0.01], [0.003, -0.002, 0.004])
    dq = pose([-0.005, 0.007, -0.004], [0.002, 0.003, -0.002])
    for i in range(batch):
        g = pose([0.1 + 1e-3 * i, -0.2, 0.15], [0.02, -0.03, 0.05])
        bt = pose([0.05, 0.03, -0.08], [0.4, -0.1, 0.2])
        bg, ct = handeye_sequence(num_obs, rng, g, bt)
        uv = render(intr, ct, obj, noise, rng)
        out["g_gt"].append(g)
        out["b_gt"].append(bt)
        out["bg"].append(bg)
        out["uv"].append(uv)
        out["g0"].append(g @ dp)
        out["b0"].append(bt @ dq)
    obj_b = np.tile(obj[None, None], (batch, num_obs, 1, 1))
    return dict(
        obj=obj_b,
        uv=np.stack(out["uv"]),
        bg=np.stack(out["bg"]),
        intr=intr,
        g_gt=np.stack(out["g_gt"]),
        b_gt=np.stack(out["b_gt"]),
        g0=np.stack(out["g0"]),
        b0=np.stack(out["b0"]),
    )


# --- config 5 (line-scan part): laser plane ---------------------------------

def linescan_problems(batch, views=6, rows=5, cols=7, n_laser=40, noise=0.1, seed=23,
                      tilt_tau=None):
    """Batch of line-scan rigs: camera + laser plane rigidly mounted, moving
    planar target. GT plane is in the camera frame; laser pixels are the
    projected intersection of the laser plane with each view's target plane
    (the geometry of linescan.h:63-91 run forward).

    tilt_tau: optional (taux, tauy) — render through the Scheimpflug model
    instead of pinhole (BASELINE config 5 names a Scheimpflug line-scan);
    the returned camera is then 12-param.

    Returns (camera (B, pc), obj (B, V, N, 2), tgt_uv (B, V, N, 2),
    laser_uv (B, V, L, 2), plane_gt (B, 4))."""
    rng = np.random.default_rng(seed)
    obj = grid(rows, cols, 0.03)
    intr = np.array([600.0, 610.0, 320.0, 240.0, 0.0, -0.12, 0.04, 0.0, 1e-4, -1e-4])
    if tilt_tau is not None:
        intr_full = np.concatenate([intr, np.asarray(tilt_tau, float)])
        proj = lambda pts: np_project_scheimpflug(intr_full, pts)
    else:
        intr_full = intr
        proj = lambda pts: np_project(intr, pts)
    theta = 0.25
    n_pl = np.array([0.0, np.sin(theta), -np.cos(theta)])

    obj3 = np.concatenate([obj, np.zeros((obj.shape[0], 1))], -1)
    objs = np.tile(obj[None, None], (batch, views, 1, 1))
    tgt_uv = np.zeros((batch, views, obj.shape[0], 2))
    laser_uv = np.zeros((batch, views, n_laser, 2))
    planes = np.zeros((batch, 4))
    for b in range(batch):
        dist = 0.85 + 0.02 * np.sin(0.7 * b)
        poses = circle_views(views, tilt=0.25, dist=dist, phase=0.03 * b)
        d_pl = -n_pl @ np.array([0.0, 0.0, dist])
        # plane stored with d >= 0 like the SVD fit's convention
        sgn = 1.0 if d_pl >= 0 else -1.0
        planes[b] = np.concatenate([sgn * n_pl, [sgn * d_pl]])
        s = np.linspace(-0.1, 0.1, n_laser)
        for v in range(views):
            rot, t = poses[v, :3, :3], poses[v, :3, 3]
            tgt_uv[b, v] = proj(obj3 @ rot.T + t) + rng.normal(
                0, noise, (obj.shape[0], 2)
            )
            ab = rot.T @ n_pl
            c = n_pl @ t + d_pl
            a2 = ab[0] ** 2 + ab[1] ** 2
            p0 = -c * ab[:2] / a2
            dvec = np.array([-ab[1], ab[0]]) / np.sqrt(a2)
            pl_xy = p0[None] + s[:, None] * dvec[None]
            pts3 = np.concatenate([pl_xy, np.zeros((n_laser, 1))], -1) @ rot.T + t
            laser_uv[b, v] = proj(pts3) + rng.normal(0, noise, (n_laser, 2))
    camera = np.tile(intr_full[None], (batch, 1))
    return camera, objs, tgt_uv, laser_uv, planes
