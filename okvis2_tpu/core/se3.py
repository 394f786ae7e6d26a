"""Batched SE(3) transformations as a jax pytree.

``Transformation`` mirrors the role of okvis::kinematics::Transformation
(okvis_kinematics/include/okvis/kinematics/Transformation.hpp:74-174) but
is a frozen dataclass of jnp arrays so it composes with jit/vmap/grad.
Storage: translation ``r`` [..., 3] and unit quaternion ``q`` [..., 4]
(xyzw). The perturbation convention matches the reference's pose manifold
(okvis_ceres PoseLocalParameterization):

    T ⊞ [dr, da] = (r + dr,  deltaQ(da) ⊗ q)      (world-frame/left)

so minimal Jacobians computed against this oplus agree with the
reference's ``EvaluateWithMinimalJacobians`` outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from okvis2_tpu.core import so3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Transformation:
    r: jnp.ndarray  # [..., 3]
    q: jnp.ndarray  # [..., 4] xyzw, unit

    # -- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        return (self.r, self.q), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors ----------------------------------------------------
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Transformation":
        return cls(
            r=jnp.zeros(batch_shape + (3,), dtype=dtype),
            q=so3.identity_quat(batch_shape, dtype=dtype),
        )

    @classmethod
    def from_matrix(cls, T: jnp.ndarray) -> "Transformation":
        """[..., 4, 4] homogeneous matrix -> Transformation."""
        return cls(r=T[..., :3, 3], q=so3.matrix_to_quat(T[..., :3, :3]))

    @classmethod
    def from_rq(cls, r, q) -> "Transformation":
        return cls(r=jnp.asarray(r), q=so3.quat_normalize(jnp.asarray(q)))

    # -- accessors ---------------------------------------------------------
    @property
    def C(self) -> jnp.ndarray:
        """Rotation matrix [..., 3, 3]."""
        return so3.quat_to_matrix(self.q)

    def matrix(self) -> jnp.ndarray:
        """Homogeneous [..., 4, 4]."""
        C = self.C
        batch = C.shape[:-2]
        T = jnp.zeros(batch + (4, 4), dtype=C.dtype)
        T = T.at[..., :3, :3].set(C)
        T = T.at[..., :3, 3].set(self.r)
        T = T.at[..., 3, 3].set(1.0)
        return T

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.r.shape[:-1]

    # -- group operations --------------------------------------------------
    def inverse(self) -> "Transformation":
        qi = so3.quat_conjugate(self.q)
        return Transformation(r=-so3.rotate(qi, self.r), q=qi)

    def __matmul__(self, other: "Transformation") -> "Transformation":
        """Composition T_AC = T_AB @ T_BC."""
        return Transformation(
            r=self.r + so3.rotate(self.q, other.r),
            q=so3.quat_normalize(so3.quat_multiply(self.q, other.q)),
        )

    def apply(self, p: jnp.ndarray) -> jnp.ndarray:
        """Transform points p [..., 3]."""
        return so3.rotate(self.q, p) + self.r

    def apply_homogeneous(self, hp: jnp.ndarray) -> jnp.ndarray:
        """Transform homogeneous points hp [..., 4]."""
        return jnp.concatenate(
            [so3.rotate(self.q, hp[..., :3]) + self.r * hp[..., 3:4], hp[..., 3:4]],
            axis=-1,
        )

    # -- manifold ------------------------------------------------------------
    def oplus(self, delta: jnp.ndarray) -> "Transformation":
        """Right-hand boxplus with world-frame rotation perturbation.

        delta: [..., 6] = [dr (3), dalpha (3)].
        """
        dq = so3.delta_q(delta[..., 3:6])
        return Transformation(
            r=self.r + delta[..., :3],
            q=so3.quat_normalize(so3.quat_multiply(dq, self.q)),
        )

    def ominus(self, other: "Transformation") -> jnp.ndarray:
        """Inverse of oplus: delta such that other ⊞ delta == self."""
        dq = so3.quat_multiply(self.q, so3.quat_conjugate(other.q))
        return jnp.concatenate([self.r - other.r, so3.quat_log(dq)], axis=-1)

    def parameters(self) -> jnp.ndarray:
        """[..., 7] = [r, q] flat parameter vector (reference block layout)."""
        return jnp.concatenate([self.r, self.q], axis=-1)

    @classmethod
    def from_parameters(cls, p: jnp.ndarray) -> "Transformation":
        return cls(r=p[..., :3], q=so3.quat_normalize(p[..., 3:7]))

    # -- indexing over batch dims -------------------------------------------
    def __getitem__(self, idx) -> "Transformation":
        return Transformation(r=self.r[idx], q=self.q[idx])


def se3_log(T: Transformation) -> jnp.ndarray:
    """Pseudo-log used for pose-graph residuals: [dr, log(q)] (6,).

    Matches the reference's relative-pose error convention (decoupled
    translation/rotation, RelativePoseError.cpp) rather than the full
    SE(3) log — the reference never uses the coupled V-matrix form.
    """
    return jnp.concatenate([T.r, so3.quat_log(T.q)], axis=-1)
