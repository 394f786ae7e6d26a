"""Unary/binary prior factors.

Covers okvis::ceres::PoseError, SpeedAndBiasError and RelativePoseError
(reference: okvis_ceres/src/PoseError.cpp, SpeedAndBiasError.cpp,
RelativePoseError.cpp) as pure functions. The pose error uses the same
decoupled [dr, dalpha] minimal coordinates as the reference's pose
manifold (PoseLocalParameterization.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

from okvis2_tpu.core import so3
from okvis2_tpu.core.se3 import Transformation


def pose_prior_residual(
    T_WS: Transformation,
    T_WS_prior: Transformation,
    sqrt_info: jnp.ndarray,  # [6,6]
) -> jnp.ndarray:
    """Whitened 6-vector pose prior residual [dr, dalpha]."""
    dr = T_WS.r - T_WS_prior.r
    dq = so3.quat_multiply(T_WS.q, so3.quat_conjugate(T_WS_prior.q))
    return sqrt_info @ jnp.concatenate([dr, so3.quat_log(dq)])


def speed_bias_prior_residual(
    sb: jnp.ndarray,  # [9]
    sb_prior: jnp.ndarray,  # [9]
    sqrt_info_diag: jnp.ndarray,  # [9] diagonal whitening
) -> jnp.ndarray:
    return sqrt_info_diag * (sb - sb_prior)


def relative_pose_residual(
    T_WA: Transformation,
    T_WB: Transformation,
    T_AB_meas: Transformation,
    sqrt_info: jnp.ndarray,  # [6,6]
) -> jnp.ndarray:
    """Whitened 6-vector relative-pose residual (loop-closure constraint,
    reference RelativePoseError.cpp:~100): error between the estimated
    relative pose A<-B and the measured one, in frame A."""
    T_AB_est = T_WA.inverse() @ T_WB
    dr = T_AB_est.r - T_AB_meas.r
    dq = so3.quat_multiply(T_AB_est.q, so3.quat_conjugate(T_AB_meas.q))
    return sqrt_info @ jnp.concatenate([dr, so3.quat_log(dq)])
