from okvis2_tpu.factors.reprojection import reprojection_residual
from okvis2_tpu.factors.imu_factor import imu_residual
from okvis2_tpu.factors.priors import (
    pose_prior_residual,
    speed_bias_prior_residual,
    relative_pose_residual,
)

__all__ = [
    "reprojection_residual",
    "imu_residual",
    "pose_prior_residual",
    "speed_bias_prior_residual",
    "relative_pose_residual",
]
