"""Lens distortion models as pure batched jnp functions.

Re-designs okvis_cv's distortion family (reference:
okvis_cv/include/okvis/cameras/implementation/RadialTangentialDistortion.hpp,
RadialTangentialDistortion8.hpp, EquidistantDistortion.hpp) for TPU:

- ``distort``   maps normalized image coordinates [..., 2] -> distorted
  [..., 2]; broadcast over any batch shape, fully differentiable (the
  solver gets Jacobians by autodiff instead of the reference's hand-coded
  2x2 blocks).
- ``undistort`` is a fixed-iteration branch-free Gauss-Newton inverse
  (the reference iterates "until convergence"; a fixed count of damped
  Newton steps compiles to a static XLA loop and converges to fp
  precision in <=8 steps for real lenses).

Parameter conventions match the reference/OpenCV orders so the same YAML
configs parse directly:
  radialtangential   : [k1, k2, p1, p2]
  radialtangential8  : [k1, k2, p1, p2, k3, k4, k5, k6]  (rational model)
  equidistant        : [k1, k2, k3, k4]                   (Kannala-Brandt)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


class Distortion:
    """Base: subclasses are frozen dataclass pytrees with a ``distort``."""

    n_params: int = 0

    def distort(self, xy: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def undistort(self, xy_d: jnp.ndarray, iterations: int = 8) -> jnp.ndarray:
        """Invert ``distort`` by damped Gauss-Newton (static unrolled loop).

        Mirrors the reference's iterative undistortion
        (RadialTangentialDistortion.hpp:~160, Newton on the 2x2 system)
        but branch-free and batched.
        """

        def step(x, _):
            # jacfwd over the trailing 2-vector; batched via implicit vmap
            y = self.distort(x)
            e = xy_d - y
            J = _jac2(self.distort, x)
            # solve J dx = e for the 2x2 system, with tiny Tikhonov guard
            a, b = J[..., 0, 0], J[..., 0, 1]
            c, d = J[..., 1, 0], J[..., 1, 1]
            det = a * d - b * c
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            dx = jnp.stack(
                [
                    (d * e[..., 0] - b * e[..., 1]) / det,
                    (-c * e[..., 0] + a * e[..., 1]) / det,
                ],
                axis=-1,
            )
            return x + dx, None

        # statically unrolled: the body is a handful of FLOPs, but a
        # lax.scan lowers to a TPU while-loop costing ~77 µs of fixed
        # overhead PER CALL SITE — the fused frontend back-projects at
        # ~14 sites, so the scans alone were ~1 ms/frame (profiled r5).
        # Unrolled, XLA fuses the whole iteration into the neighbours.
        x = xy_d
        for _ in range(iterations):
            x, _ = step(x, None)
        return x

    def params(self) -> jnp.ndarray:
        raise NotImplementedError


def _jac2(fn, x):
    """Jacobian of an R^2->R^2 map over the last axis, batched."""
    basis = jnp.eye(2, dtype=x.dtype)
    # forward-mode JVPs along the two basis directions
    cols = [jax.jvp(fn, (x,), (jnp.broadcast_to(b, x.shape),))[1] for b in basis]
    return jnp.stack(cols, axis=-1)  # [..., 2, 2]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NoDistortion(Distortion):
    n_params = 0

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    def distort(self, xy):
        return xy

    def undistort(self, xy_d, iterations: int = 8):
        return xy_d

    def params(self):
        return jnp.zeros((0,))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RadialTangentialDistortion(Distortion):
    """Brown-Conrady [k1, k2, p1, p2]."""

    k: jnp.ndarray  # [4]
    n_params = 4

    def tree_flatten(self):
        return (self.k,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_params(cls, p):
        return cls(k=jnp.asarray(p))

    def distort(self, xy):
        k1, k2, p1, p2 = self.k[0], self.k[1], self.k[2], self.k[3]
        x, y = xy[..., 0], xy[..., 1]
        x2, y2, xy_ = x * x, y * y, x * y
        r2 = x2 + y2
        rad = 1.0 + r2 * (k1 + k2 * r2)
        xd = x * rad + 2.0 * p1 * xy_ + p2 * (r2 + 2.0 * x2)
        yd = y * rad + 2.0 * p2 * xy_ + p1 * (r2 + 2.0 * y2)
        return jnp.stack([xd, yd], axis=-1)

    def params(self):
        return self.k


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RadialTangentialDistortion8(Distortion):
    """Rational model [k1, k2, p1, p2, k3, k4, k5, k6] (OpenCV order)."""

    k: jnp.ndarray  # [8]
    n_params = 8

    def tree_flatten(self):
        return (self.k,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_params(cls, p):
        return cls(k=jnp.asarray(p))

    def distort(self, xy):
        k1, k2, p1, p2 = self.k[0], self.k[1], self.k[2], self.k[3]
        k3, k4, k5, k6 = self.k[4], self.k[5], self.k[6], self.k[7]
        x, y = xy[..., 0], xy[..., 1]
        x2, y2, xy_ = x * x, y * y, x * y
        r2 = x2 + y2
        num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
        rad = num / den
        xd = x * rad + 2.0 * p1 * xy_ + p2 * (r2 + 2.0 * x2)
        yd = y * rad + 2.0 * p2 * xy_ + p1 * (r2 + 2.0 * y2)
        return jnp.stack([xd, yd], axis=-1)

    def params(self):
        return self.k


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EquidistantDistortion(Distortion):
    """Kannala-Brandt fisheye [k1, k2, k3, k4]."""

    k: jnp.ndarray  # [4]
    n_params = 4

    def tree_flatten(self):
        return (self.k,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_params(cls, p):
        return cls(k=jnp.asarray(p))

    def distort(self, xy):
        k1, k2, k3, k4 = self.k[0], self.k[1], self.k[2], self.k[3]
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r = jnp.sqrt(r2)
        theta = jnp.arctan(r)
        t2 = theta * theta
        thetad = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        safe_r = jnp.where(r > 1e-8, r, 1.0)
        scaling = jnp.where(r > 1e-8, thetad / safe_r, 1.0)
        return xy * scaling[..., None]

    def params(self):
        return self.k


_REGISTRY = {
    "none": NoDistortion,
    "radialtangential": RadialTangentialDistortion,
    "radial-tangential": RadialTangentialDistortion,
    "plumb_bob": RadialTangentialDistortion,
    "radialtangential8": RadialTangentialDistortion8,
    "radial-tangential8": RadialTangentialDistortion8,
    "equidistant": EquidistantDistortion,
}


def distortion_by_name(name: str, params) -> Distortion:
    """Build a distortion from the YAML ``distortion_type`` tag
    (same accepted strings as ViParametersReader.cpp:~300)."""
    cls = _REGISTRY[name.strip().lower()]
    if cls is NoDistortion:
        return NoDistortion()
    return cls.from_params(jnp.asarray(params, dtype=jnp.float64)
                           if jax.config.jax_enable_x64 else
                           jnp.asarray(params, dtype=jnp.float32))
