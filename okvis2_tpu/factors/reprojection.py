"""Reprojection factor (2 residuals).

Covers okvis::ceres::ReprojectionError (reference:
okvis_ceres/include/okvis/ceres/implementation/ReprojectionError.hpp:91-244)
as a pure function; the whitening follows the reference convention
sqrt_info = (8/keypoint_size) * I  (information = 64/size^2 * I,
ReprojectionError.hpp:76).

Unlike the reference there are no hand-coded minimal Jacobians — the solver
differentiates this function with jax.jacfwd against the minimal
perturbations, guaranteeing residual/Jacobian consistency.
"""

from __future__ import annotations

import jax.numpy as jnp

from okvis2_tpu.core.se3 import Transformation


def reprojection_residual(
    T_WS: Transformation,
    T_SC: Transformation,
    hp_W: jnp.ndarray,  # [..., 4] homogeneous landmark in world
    uv_meas: jnp.ndarray,  # [..., 2] measured keypoint
    camera,
    sqrt_info: jnp.ndarray,  # [...]: scalar whitening (8 / keypoint size)
):
    """Whitened reprojection residual and a validity flag.

    Returns (r [..., 2], valid [...]); invalid projections (behind camera)
    yield a zero residual so masked observations contribute nothing.
    """
    T_CW = (T_WS @ T_SC).inverse()
    hp_C = T_CW.apply_homogeneous(hp_W)
    uv_hat, valid = camera.project_homogeneous(hp_C)
    r = (uv_hat - uv_meas) * sqrt_info[..., None]
    r = jnp.where(valid[..., None], r, jnp.zeros_like(r))
    return r, valid


def cauchy_weight(squared_norm: jnp.ndarray, scale: jnp.ndarray = 1.0):
    """Cauchy robust-loss IRLS weight sqrt(rho'(s)).

    The solver multiplies residual+Jacobian rows by this weight
    (reweighted least squares), the XLA-friendly equivalent of Ceres'
    CauchyLoss + Triggs corrected Jacobians used by the reference
    (TwoPoseGraphError.cpp:267-310).
    """
    s = squared_norm / (scale * scale)
    return jnp.sqrt(1.0 / (1.0 + s))
