"""Pinhole camera model, batched and differentiable.

Re-designs okvis::cameras::PinholeCamera<DISTORTION_T>
(okvis_cv/include/okvis/cameras/implementation/PinholeCamera.hpp:1-693)
as a frozen pytree. ``project``/``back_project`` broadcast over arbitrary
batch shapes and are pure jnp, so reprojection-factor Jacobians come from
autodiff and the whole projection pipeline fuses into the solver's XLA
program (no per-keypoint host calls like the reference's virtual
dispatch).

Projection status is returned as a boolean validity mask plus a separate
"behind camera" flag — the masked-fixed-shape equivalent of the
reference's ProjectionStatus enum (CameraBase.hpp: Successful /
OutsideImage / Behind / Invalid).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from okvis2_tpu.cameras.distortion import Distortion, NoDistortion


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    focal: jnp.ndarray  # [2] = [fu, fv]
    center: jnp.ndarray  # [2] = [cu, cv]
    distortion: Distortion
    image_size: Tuple[int, int] = (752, 480)  # (width, height), static

    def tree_flatten(self):
        return (self.focal, self.center, self.distortion), self.image_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, width, height, fu, fv, cu, cv, distortion=None, dtype=None):
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return cls(
            focal=jnp.asarray([fu, fv], dtype=dtype),
            center=jnp.asarray([cu, cv], dtype=dtype),
            distortion=distortion if distortion is not None else NoDistortion(),
            image_size=(int(width), int(height)),
        )

    @classmethod
    def create_test_object(cls, distortion_cls=None, dtype=None):
        """Synthetic 752x480 camera matching the spirit of the reference's
        PinholeCamera::createTestObject (used throughout the unit tests)."""
        from okvis2_tpu.cameras import distortion as D

        if distortion_cls is None or distortion_cls is D.NoDistortion:
            dist = D.NoDistortion()
        elif distortion_cls is D.RadialTangentialDistortion:
            dist = D.RadialTangentialDistortion.from_params(
                [-0.28, 0.07, 0.0002, 1.8e-05]
            )
        elif distortion_cls is D.RadialTangentialDistortion8:
            dist = D.RadialTangentialDistortion8.from_params(
                [-0.28, 0.07, 0.0002, 1.8e-05, 0.0, 0.0, 0.0, 0.0]
            )
        elif distortion_cls is D.EquidistantDistortion:
            dist = D.EquidistantDistortion.from_params(
                [-0.01, 0.02, -0.004, 0.002]
            )
        else:
            raise ValueError(distortion_cls)
        return cls.create(752, 480, 458.65, 457.30, 367.21, 248.37, dist, dtype)

    # ------------------------------------------------------------------
    @property
    def width(self) -> int:
        return self.image_size[0]

    @property
    def height(self) -> int:
        return self.image_size[1]

    def intrinsics(self) -> jnp.ndarray:
        """[fu, fv, cu, cv, *distortion] flat vector (ref intrinsics layout)."""
        return jnp.concatenate([self.focal, self.center, self.distortion.params()])

    @classmethod
    def from_intrinsics(cls, intr: jnp.ndarray, distortion_cls, image_size):
        """Rebuild from a flat intrinsics vector — used when intrinsics are
        optimisation variables (online calibration)."""
        dist = distortion_cls.from_params(intr[4:]) if intr.shape[0] > 4 else NoDistortion()
        return cls(focal=intr[0:2], center=intr[2:4], distortion=dist,
                   image_size=image_size)

    # ------------------------------------------------------------------
    def project(self, p_C: jnp.ndarray):
        """Project camera-frame points [..., 3] -> pixels [..., 2], valid.

        valid = in front of camera AND inside image bounds (with the
        same half-pixel margin convention as the reference: pixel in
        [-0.5, size-0.5)).
        """
        z = p_C[..., 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
        xy = p_C[..., :2] / safe_z[..., None]
        xyd = self.distortion.distort(xy)
        uv = xyd * self.focal + self.center
        in_front = z > 1e-12
        in_image = (
            (uv[..., 0] >= -0.5)
            & (uv[..., 0] <= self.width - 0.5)
            & (uv[..., 1] >= -0.5)
            & (uv[..., 1] <= self.height - 0.5)
        )
        return uv, in_front & in_image

    def project_homogeneous(self, hp_C: jnp.ndarray):
        """Project homogeneous camera-frame points [..., 4].

        Negative-w points are sign-flipped first (reference
        projectHomogeneous behaviour).
        """
        sign = jnp.where(hp_C[..., 3] < 0.0, -1.0, 1.0)
        return self.project(hp_C[..., :3] * sign[..., None])

    def back_project(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixels [..., 2] -> unit-norm ray directions [..., 3]."""
        xyd = (uv - self.center) / self.focal
        xy = self.distortion.undistort(xyd)
        ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    def back_project_unnormalized(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixels -> rays with z=1 (cheaper when only the direction ratio
        matters, e.g. triangulation in the camera frame)."""
        xyd = (uv - self.center) / self.focal
        xy = self.distortion.undistort(xyd)
        return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
