from okvis2_tpu.imu.preintegration import (
    ImuParameters,
    Preintegrated,
    preintegrate,
    propagate_state,
    init_pose_from_accel,
)

__all__ = [
    "ImuParameters",
    "Preintegrated",
    "preintegrate",
    "propagate_state",
    "init_pose_from_accel",
]
