"""Multi-camera extrinsics initialisation via planar-pose averaging
(reference: include/calib/estimation/linear/extrinsics.h:27-78).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import planarpose, se3


class ExtrinsicPoses(NamedTuple):
    c_se3_r: jnp.ndarray  # (C, 4, 4) reference->camera
    r_se3_t: jnp.ndarray  # (V, 4, 4) target->reference


def estimate_extrinsic_dlt(obj_xy, norm_uv, mask=None):
    """Per-(view, cam) planar pose -> relative poses vs cam0 averaged over
    views -> per-view target poses averaged over cams (extrinsics.h:38-77).

    obj_xy/norm_uv: (V, C, N, 2) with image coords already normalized by each
    camera's intrinsics (the reference calls ``apply_intrinsics`` — the linear
    normalization — before its inline DLT, planarpose.h:46-49).
    mask: optional (V, C, N).
    """
    v, c = obj_xy.shape[0], obj_xy.shape[1]
    if mask is None:
        mask = jnp.ones(obj_xy.shape[:-1], bool)
    valid = jnp.sum(mask, axis=-1) >= 4  # (V, C), extrinsics.h:57,69

    pose_fn = jax.vmap(jax.vmap(planarpose.estimate_planar_pose_normalized))
    cam_se3_ref = pose_fn(obj_xy, norm_uv, mask)  # (V, C, 4, 4)

    # Step 2: relative camera poses vs cam 0, averaged over views.
    rels = cam_se3_ref @ se3.se3_inverse(cam_se3_ref[:, 0:1])  # (V, C, 4, 4)
    rel_w = (valid & valid[:, 0:1]).astype(obj_xy.dtype)  # (V, C)
    c_se3_r = jax.vmap(se3.average_isometries, in_axes=(1, 1))(rels, rel_w)  # (C,4,4)
    c_se3_r = c_se3_r.at[0].set(jnp.eye(4, dtype=obj_xy.dtype))

    # Step 3: per-view target poses averaged over cameras.
    tposes = se3.se3_inverse(c_se3_r)[None] @ cam_se3_ref  # (V, C, 4, 4)
    r_se3_t = jax.vmap(se3.average_isometries)(tposes, valid.astype(obj_xy.dtype))
    return ExtrinsicPoses(c_se3_r, r_se3_t)
