"""Synthetic-data generators mirroring the reference test fixtures
(reference: tests/unit/utils.h — SimulatedHandEye, make_target_grid,
make_sequence, render_pixels). Ground-truth first: build a camera and poses,
render pixels, assert parameter recovery.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from calibration_tpu.models import pinhole
from calibration_tpu.ops import se3


def make_target_grid(rows=8, cols=11, pitch=0.03):
    """Planar grid in target frame, Z=0 (utils.h:223-231). Returns (N, 2)."""
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    pts = np.stack([xs.ravel() * pitch, ys.ravel() * pitch], axis=-1)
    return pts - pts.mean(axis=0)


def euler_pose(rx, ry, rz, t):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = Rz @ Ry @ Rx
    m[:3, 3] = t
    return m


def default_camera():
    """Representative pinhole with mild Brown-Conrady distortion."""
    kmtx = np.array([600.0, 610.0, 320.0, 240.0, 0.0])
    dist = np.array([-0.15, 0.05, 0.0, 1e-4, -2e-4])  # k1,k2,k3,p1,p2
    return np.concatenate([kmtx, dist])


def circle_views(num_views=8, radius=0.4, dist=0.8, tilt=0.25):
    """Camera poses on a circle looking at the target — varied homographies
    for Zhang (cf. make_circle_poses, utils.h:81-120)."""
    poses = []
    for i in range(num_views):
        ang = 2 * np.pi * i / num_views
        rx = tilt * np.cos(ang)
        ry = tilt * np.sin(ang)
        rz = 0.1 * np.sin(2 * ang)
        t = np.array([radius * np.cos(ang) * 0.2, radius * np.sin(ang) * 0.2, dist + 0.1 * np.sin(ang)])
        poses.append(euler_pose(rx, ry, rz, t))
    return np.stack(poses)


def render_pixels(intr, c_se3_t, obj_xy, noise=0.0, rng=None):
    """Project target grid points through the camera for each view
    (utils.h:233-251). intr: (10,); c_se3_t: (V, 4, 4); obj_xy: (N, 2).
    Returns (V, N, 2)."""
    obj3 = jnp.concatenate([jnp.asarray(obj_xy), jnp.zeros((obj_xy.shape[0], 1))], axis=-1)
    pts_c = se3.se3_apply(jnp.asarray(c_se3_t)[:, None], obj3[None])
    uv = pinhole.project(jnp.asarray(intr), pts_c)
    uv = np.asarray(uv)
    if noise > 0:
        assert rng is not None
        uv = uv + rng.normal(0.0, noise, uv.shape)
    return uv


def make_handeye_sequence(num_poses=12, rng=None, angle_amp=0.4, trans_amp=0.08):
    """Gripper trajectory with the camera always facing the target
    (utils.h:203-221). Physical construction: draw camera->target views
    (target in front, t_z > 0, varied rotations for AX=XB excitation) and
    derive the gripper poses b_se3_g = b_se3_t * (c_se3_t)^-1 * (g_se3_c)^-1
    — randomizing b_se3_g directly can put the target behind the camera,
    which renders to pixels no real detector would produce.

    Returns dict with ground truth: g_se3_c (hand-eye), b_se3_t (base->target),
    b_se3_g list, c_se3_t list.
    """
    rng = rng or np.random.default_rng(0xC001C0DE)
    g_se3_c = euler_pose(0.1, -0.2, 0.15, [0.02, -0.03, 0.05])
    b_se3_t = euler_pose(0.05, 0.03, -0.08, [0.4, -0.1, 0.2])
    b_se3_g = []
    c_se3_t = []
    for _ in range(num_poses):
        ang = rng.uniform(-angle_amp, angle_amp, 3)
        tr = rng.uniform(-trans_amp, trans_amp, 3) + np.array([0.0, 0.0, 0.7])
        ct = euler_pose(*ang, tr)
        c_se3_t.append(ct)
        bg = b_se3_t @ np.linalg.inv(ct) @ np.linalg.inv(g_se3_c)
        b_se3_g.append(bg)
    return {
        "g_se3_c": g_se3_c,
        "b_se3_t": b_se3_t,
        "b_se3_g": np.stack(b_se3_g),
        "c_se3_t": np.stack(c_se3_t),
    }


def rot_err_deg(a, b):
    ra, rb = np.asarray(a)[:3, :3], np.asarray(b)[:3, :3]
    c = (np.trace(ra.T @ rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def trans_err(a, b):
    return float(np.linalg.norm(np.asarray(a)[:3, 3] - np.asarray(b)[:3, 3]))
