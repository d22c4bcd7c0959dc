"""Parameter-vector packing helpers shared by the LM solvers.

The flat ambient layout of each solver matches the reference's
``get_param_blocks`` order so covariance matrices line up entry-for-entry
(e.g. IntrinsicBlocks: intrinsics, then all quaternions, then all
translations — src/estimation/optim/intrinsics.cpp:36-52).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import se3


def poses_to_quat_tran(poses):
    """(V, 4, 4) -> ((V, 4) wxyz quats, (V, 3) translations)."""
    return se3.rotmat_to_quat(se3.rot(poses)), se3.tra(poses)


def quat_tran_to_poses(quats, trans):
    return se3.make_se3(se3.quat_to_rotmat(quats), trans)


def pack_intr_quats_trans(intr, quats, trans):
    return jnp.concatenate([intr.reshape(-1), quats.reshape(-1), trans.reshape(-1)])


def unpack_intr_quats_trans(x, pc, v):
    intr = x[:pc]
    quats = x[pc : pc + 4 * v].reshape(v, 4)
    trans = x[pc + 4 * v :].reshape(v, 3)
    return intr, quats, trans
