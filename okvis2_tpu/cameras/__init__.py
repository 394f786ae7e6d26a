from okvis2_tpu.cameras.distortion import (
    Distortion,
    EquidistantDistortion,
    NoDistortion,
    RadialTangentialDistortion,
    RadialTangentialDistortion8,
    distortion_by_name,
)
from okvis2_tpu.cameras.pinhole import PinholeCamera
from okvis2_tpu.cameras.ncamera import NCameraSystem
