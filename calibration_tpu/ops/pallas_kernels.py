"""Pallas TPU kernels for the hot per-point projection path.

The innermost compute of every LM residual is: pose transform -> perspective
divide -> Brown-Conrady distortion -> intrinsics -> pixel residual
(reference call stack SURVEY.md section 3.5, ~30 flops/point). XLA fuses this
chain well in the f64 solve path; this module provides the explicit
float32 fused kernel used by throughput paths that tolerate single
precision (RANSAC residual scoring, reprojection-RMS evaluation, mixed
-precision LM experiments).

Layout: problems x views flatten to rows, points pad to 128-lane tiles; one
(8, 128) VPU tile processes 8 views x 128 points with per-row camera/pose
parameters broadcast from a (8, 32) parameter block. Everything is
elementwise on the VPU — there is no matmul here, so the MXU is untouched
and the kernel is purely bandwidth-bound, which is the point: one pass over
HBM instead of several.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ROW_TILE = 8
LANE_TILE = 128
PARAM_WIDTH = 32  # 9 rot + 3 tra + 5 kmtx + 5 dist = 22, padded to 32


def _pack_params(rot, tra, intr):
    """rot (R,3,3), tra (R,3), intr (R,10) -> (R, PARAM_WIDTH) f32."""
    r = rot.reshape(rot.shape[0], 9)
    p = jnp.concatenate([r, tra, intr], axis=-1)
    pad = PARAM_WIDTH - p.shape[-1]
    return jnp.pad(p, ((0, 0), (0, pad))).astype(jnp.float32)


def _residual_kernel(params_ref, ox_ref, oy_ref, u_ref, v_ref, m_ref, rx_ref, ry_ref):
    p = params_ref[:]  # (ROW_TILE, PARAM_WIDTH)

    def col(i):
        return p[:, i][:, None]  # (ROW_TILE, 1) broadcast over lanes

    ox = ox_ref[:]
    oy = oy_ref[:]
    # camera-frame point: R @ [ox, oy, 0] + t
    xc = col(0) * ox + col(1) * oy + col(9)
    yc = col(3) * ox + col(4) * oy + col(10)
    zc = col(6) * ox + col(7) * oy + col(11)
    inv_z = 1.0 / zc
    xn = xc * inv_z
    yn = yc * inv_z
    # Brown-Conrady [k1, k2, k3, p1, p2] (distortion.h:91-116 ordering)
    r2 = xn * xn + yn * yn
    k1, k2, k3 = col(17), col(18), col(19)
    p1, p2 = col(20), col(21)
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    fx, fy, cx, cy, skew = col(12), col(13), col(14), col(15), col(16)
    upred = fx * xd + skew * yd + cx
    vpred = fy * yd + cy
    m = m_ref[:]
    rx_ref[:] = (upred - u_ref[:]) * m
    ry_ref[:] = (vpred - v_ref[:]) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def projection_residuals_f32(rot, tra, intr, obj_xy, img_uv, mask, interpret=False):
    """Fused masked reprojection residuals.

    rot: (R, 3, 3); tra: (R, 3); intr: (R, 10) [fx,fy,cx,cy,skew,k1,k2,k3,p1,p2];
    obj_xy/img_uv: (R, N, 2); mask: (R, N). Returns (R, N, 2) float32.
    R = flattened problems x views.
    """
    from jax.experimental import pallas as pl

    r, n = obj_xy.shape[0], obj_xy.shape[1]
    rp = -(-r // ROW_TILE) * ROW_TILE
    npad = -(-n // LANE_TILE) * LANE_TILE

    params = _pack_params(rot, tra, intr)
    params = jnp.pad(params, ((0, rp - r), (0, 0)))

    def pad2(a):
        return jnp.pad(a.astype(jnp.float32), ((0, rp - r), (0, npad - n)))

    ox = pad2(obj_xy[..., 0])
    oy = pad2(obj_xy[..., 1])
    uu = pad2(img_uv[..., 0])
    vv = pad2(img_uv[..., 1])
    mm = pad2(mask.astype(jnp.float32))

    grid = (rp // ROW_TILE, npad // LANE_TILE)
    data_spec = pl.BlockSpec((ROW_TILE, LANE_TILE), lambda i, j: (i, j))
    param_spec = pl.BlockSpec((ROW_TILE, PARAM_WIDTH), lambda i, j: (i, 0))

    rx, ry = pl.pallas_call(
        _residual_kernel,
        grid=grid,
        in_specs=[param_spec, data_spec, data_spec, data_spec, data_spec, data_spec],
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rp, npad), jnp.float32),
            jax.ShapeDtypeStruct((rp, npad), jnp.float32),
        ),
        interpret=interpret,
    )(params, ox, oy, uu, vv, mm)
    return jnp.stack([rx[:r, :n], ry[:r, :n]], axis=-1)


@jax.jit
def projection_residuals_xla(rot, tra, intr, obj_xy, img_uv, mask):
    """Reference XLA implementation (fallback + correctness oracle)."""
    from ..models import pinhole

    pts = jnp.concatenate([obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], -1)
    pc = jnp.einsum("rij,rnj->rni", rot, pts) + tra[:, None, :]
    uv_hat = pinhole.project(intr[:, None, :], pc)
    return (uv_hat - img_uv) * mask[..., None]


@functools.lru_cache(maxsize=1)
def native_pallas_available() -> bool:
    """Whether Mosaic (non-interpret) pallas lowering works on this backend.

    Some TPU attachments lower pallas through the CPU path and raise
    "Only interpret mode is supported on CPU backend" at compile time —
    a backend-name check is not enough, so probe with a tiny compile once
    per process and cache the answer.
    """
    if jax.default_backend() != "tpu":
        return False
    try:
        one = jnp.ones((ROW_TILE, LANE_TILE), jnp.float32)
        rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (ROW_TILE, 3, 3))
        tra = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (ROW_TILE, 1))
        intr = jnp.tile(
            jnp.array([[1.0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.float32),
            (ROW_TILE, 1),
        )
        obj = jnp.zeros((ROW_TILE, LANE_TILE, 2), jnp.float32)
        uv = jnp.zeros((ROW_TILE, LANE_TILE, 2), jnp.float32)
        jax.block_until_ready(
            projection_residuals_f32(rot, tra, intr, obj, uv, one, interpret=False)
        )
        return True
    except Exception:  # noqa: BLE001 — any lowering/compile failure => fall back
        return False


def projection_residuals(rot, tra, intr, obj_xy, img_uv, mask):
    """Fused f32 residuals: native Pallas when the backend supports it,
    XLA (which fuses this chain well) otherwise.

    The probe compiles a tiny pallas program, so this dispatcher must be
    called OUTSIDE any jit trace (both branches are jitted themselves)."""
    if native_pallas_available():
        return projection_residuals_f32(rot, tra, intr, obj_xy, img_uv, mask)
    return projection_residuals_xla(
        jnp.asarray(rot, jnp.float32), jnp.asarray(tra, jnp.float32),
        jnp.asarray(intr, jnp.float32), jnp.asarray(obj_xy, jnp.float32),
        jnp.asarray(img_uv, jnp.float32), jnp.asarray(mask, jnp.float32),
    )
