"""Product manifolds for LM parameter blocks.

The JAX-idiomatic replacement for Ceres manifolds: the ambient parameter
vector stays flat; LM steps live in the tangent space and are mapped back by
``retract``. A quaternion block is the ``ceres::QuaternionManifold``
equivalent (4 ambient / 3 tangent, reference: src/estimation/optim/*.cpp
``SetManifold`` calls); fixed coordinates (SubsetManifold / constant blocks /
gauge fixing) are handled by the LM engine's free-mask, not here, so
toggling them never changes shapes or recompiles.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import se3

Block = Tuple[str, int]  # ("euclid", n) or ("quat", 4)


def euclid(n: int) -> Block:
    return ("euclid", n)


def quat() -> Block:
    return ("quat", 4)


class ProductManifold:
    """Static block structure; retract is built once per spec."""

    def __init__(self, blocks: Sequence[Block]):
        self.blocks = tuple(blocks)
        self.ambient_dim = 0
        self.tangent_dim = 0
        self._segments = []  # (kind, amb_slice, tan_slice)
        for kind, n in self.blocks:
            if kind == "euclid":
                a, t = n, n
            elif kind == "quat":
                a, t = 4, 3
            else:
                raise ValueError(f"unknown block kind {kind}")
            self._segments.append(
                (kind, slice(self.ambient_dim, self.ambient_dim + a),
                 slice(self.tangent_dim, self.tangent_dim + t))
            )
            self.ambient_dim += a
            self.tangent_dim += t

    def retract(self, x, delta):
        """x_ambient (+) delta_tangent -> x_ambient."""
        parts = []
        for kind, sa, st in self._segments:
            if kind == "euclid":
                parts.append(x[..., sa] + delta[..., st])
            else:  # quat: right-multiply local exp (normalized)
                q = x[..., sa]
                dq = se3.exp_quat(delta[..., st])
                qn = se3.quat_mul(q, dq)
                parts.append(qn / jnp.linalg.norm(qn, axis=-1, keepdims=True))
        return jnp.concatenate(parts, axis=-1)

    def lift_jacobian(self, x):
        """d retract / d delta at delta = 0: (ambient_dim, tangent_dim).

        Used to lift the tangent-space covariance into ambient coordinates,
        matching how Ceres reports ambient-size covariance blocks
        (ceresutils.h:69-126).
        """
        zero = jnp.zeros((self.tangent_dim,), x.dtype)
        return jax.jacfwd(lambda d: self.retract(x, d))(zero)

    def ambient_to_tangent_mask(self, amb_mask):
        """Map an ambient free-mask to tangent dims (quat: any-of-4 -> 3)."""
        parts = []
        for kind, sa, st in self._segments:
            if kind == "euclid":
                parts.append(amb_mask[..., sa])
            else:
                any_free = jnp.any(amb_mask[..., sa], axis=-1, keepdims=True)
                parts.append(jnp.broadcast_to(any_free, amb_mask.shape[:-1] + (3,)))
        return jnp.concatenate(parts, axis=-1)
